"""HPO trial entry point (reference train_nni.py equivalent).

Differences from the main trainer, mirrored from the reference
(SURVEY.md section 2.1 NNI row):
  * discriminator is always the full FCDiscriminator (train_nni.py:68);
  * D consumes the out32 auxiliary head (train_nni.py:135,150,156)
    -> --d_head 2;
  * the update ordering is the COMBINED one (train_nni.py:105-163: one
    zero_grad per optimizer, four accumulated backwards, one step per
    optimizer -- both G forwards at the same initial weights, D stepped
    once on summed src+tgt grads) -> --da_step_mode combined; trajectory
    parity vs the reference's literal loop is pinned in
    tests/test_eval_parity.py via tools/reference_eval.py::
    run_reference_train_da_nni;
  * hyperparameters come from the tuner (batch_size, lr, lr_D1,
    num_epochs, lambda_adv1, weight_decay -- train_nni.py:58,305);
  * intermediate mIoU reported per validation epoch and the max at the end
    (train_nni.py:194-195).

The reference trial script's latent crashes are fixed: its GtaV ctor arity
bug (train_nni.py:71 passes 5 args to a 4-param __init__) and missing ``os``
import (train_nni.py:182) simply don't exist here, and the poly-LR bug
(train_nni.py:98 decays ``optimizer`` twice instead of optimizer_D1) is
implemented correctly by default (the bug-faithful LR dataflow stays
available via --nni_faithful_lr for parity oracles).
"""

from __future__ import annotations

import argparse
import json
from typing import Optional


class _Reporter:
    """nni.report_* when available, JSONL file otherwise."""

    def __init__(self, output: Optional[str]):
        self.output = output
        try:
            import nni

            self.nni = nni
        except ImportError:
            self.nni = None

    def intermediate(self, value: float):
        if self.nni is not None:
            self.nni.report_intermediate_result(value)
        if self.output:
            with open(self.output, "a") as f:
                f.write(json.dumps({"type": "intermediate",
                                    "value": value}) + "\n")

    def final(self, value: float):
        if self.nni is not None:
            self.nni.report_final_result(value)
        if self.output:
            with open(self.output, "a") as f:
                f.write(json.dumps({"type": "final", "value": value}) + "\n")


# the reference's search-space key names (experiment_nni.py:107-114) map
# onto ours, so a user's existing reference NNI config works unchanged
_REFERENCE_PARAM_ALIASES = {
    "batch-size": "batch_size",
    "learning_rate": "lr",
    "learning_rate_D": "lr_D1",
    "lambda_adv_target1": "lambda_adv1",
}


def get_params(args) -> dict:
    if args.nni_params:
        params = json.loads(args.nni_params)
    else:
        try:
            import nni

            params = nni.get_next_parameter()
        except ImportError:
            params = {}
    return {_REFERENCE_PARAM_ALIASES.get(k, k): v for k, v in params.items()}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--nni_params", type=str, default=None)
    parser.add_argument("--nni_output", type=str, default=None)
    known, passthrough = parser.parse_known_args(argv)

    params = get_params(known)
    reporter = _Reporter(known.nni_output)

    from .. import cli

    cli_args = passthrough + [
        "--domain_adaptation", "True",
        "--d_head", "2",                 # train_nni.py:135 out32 head
        "--depthwise", "False",          # train_nni.py:68 always FCD
        "--da_step_mode", "combined",    # train_nni.py:116-163 ordering
    ]
    if "batch_size" in params:
        cli_args += ["--batch_size", str(int(params["batch_size"]))]
    if "lr" in params:
        cli_args += ["--learning_rate", str(params["lr"])]
    if "lr_D1" in params:
        cli_args += ["--learning_rate_D", str(params["lr_D1"])]
    if "num_epochs" in params:
        cli_args += ["--num_epochs", str(int(params["num_epochs"]))]
    if "lambda_adv1" in params:
        cli_args += ["--lambda_adv_target1", str(params["lambda_adv1"])]
    if "weight_decay" in params:
        cli_args += ["--weight_decay", str(params["weight_decay"])]

    # Per-validation-epoch intermediate reporting (train_nni.py:194): the
    # trainer calls back after every validation so the tuner gets an
    # early-stopping signal, not just one number at the end.
    result = cli.main(cli_args,
                      report_fn=lambda epoch, miou:
                      reporter.intermediate(float(miou)))
    # explicit key checks, NOT an `or` chain: a legitimate max_miou of
    # 0.0 (every validation diverged) is falsy and would fall through to
    # the final-eval miou — a DIFFERENT metric than the reference's
    # max-of-validations (train_nni.py:195), skewing the tuner
    if "max_miou" in result:
        miou = float(result["max_miou"])
    elif "miou" in result:
        miou = float(result["miou"])
    else:
        miou = 0.0
    reporter.final(miou)
    return miou


if __name__ == "__main__":
    main()

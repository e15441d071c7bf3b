"""TPU-native semantic segmentation + adversarial domain adaptation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch project ``TiloccaS/DASemanticSegmentationAML`` (see SURVEY.md):

* STDCNet813 backbone + BiSeNet context path (ARM/FFM, 3 seg heads)
  -- reference model/stdcnet.py, model/model_stages.py
* FCDiscriminator + depthwise-separable (+/-BN) variants
  -- reference model/discriminator.py
* Cityscapes / GTA5 data pipelines with label-ID remap and the CS-HF / H-RP /
  B-GS-R augmentation families -- reference dataset/{cityscapes,GTAV}.py
* Supervised training, domain-shift eval, adversarial DA training
  -- reference train.py
* ``.pth``/``.tar`` checkpoint import for parity with reference weights.

Design: NHWC layout, bf16 compute policy with fp32 params, ICI-mesh data
parallelism via ``jax.sharding`` + ``jit``, host-decode -> on-device-transform
input pipeline, Pallas kernels for the bandwidth-bound eval path.
"""

__version__ = "0.1.0"

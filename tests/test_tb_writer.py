"""Native TensorBoard event writer: wire-format round trip.

The reference's observability surface is tensorboardX scalars
(reference train.py:64,98,272-274). tensorboardX is not installed in
this image, so utils/tb_writer.py writes events.out.tfevents files from
scratch; these tests decode them with an independent minimal TFRecord +
proto-wire parser, and pin the CRC32C implementation to published
known-answer vectors so the framing check is not circular.
"""

import glob
import os
import struct

from dasemanticsegmentationaml_tpu.utils.logging_util import make_writer
from dasemanticsegmentationaml_tpu.utils.tb_writer import (
    EventWriter,
    crc32c,
    masked_crc32c,
)


def test_crc32c_known_answers():
    # RFC 3720 / Castagnoli test vectors.
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def _read_records(path):
    """Independent TFRecord reader: verifies both CRCs per record."""
    records = []
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        (length,) = struct.unpack_from("<Q", data, off)
        (len_crc,) = struct.unpack_from("<I", data, off + 8)
        assert masked_crc32c(data[off:off + 8]) == len_crc
        payload = data[off + 12:off + 12 + length]
        (crc,) = struct.unpack_from("<I", data, off + 12 + length)
        assert masked_crc32c(payload) == crc
        records.append(payload)
        off += 12 + length + 4
    return records


def _decode_varint(buf, off):
    result = shift = 0
    while True:
        b = buf[off]
        off += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, off
        shift += 7


def _decode_fields(buf):
    """proto wire decoder -> {field: [raw values]}."""
    fields = {}
    off = 0
    while off < len(buf):
        key, off = _decode_varint(buf, off)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, off = _decode_varint(buf, off)
        elif wire == 1:
            val = struct.unpack_from("<d", buf, off)[0]
            off += 8
        elif wire == 5:
            val = struct.unpack_from("<f", buf, off)[0]
            off += 4
        elif wire == 2:
            ln, off = _decode_varint(buf, off)
            val = buf[off:off + ln]
            off += ln
        else:  # pragma: no cover
            raise AssertionError(f"unexpected wire type {wire}")
        fields.setdefault(field, []).append(val)
    return fields


def test_event_file_round_trip(tmp_path):
    logdir = str(tmp_path / "run")
    w = EventWriter(logdir)
    w.add_scalar("loss_step", 2.5, 7)
    w.add_scalar("epoch/miou val", 0.625, 3, walltime=123.0)
    w.close()

    (path,) = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    records = _read_records(path)
    assert len(records) == 3

    head = _decode_fields(records[0])
    assert head[3] == [b"brain.Event:2"]

    ev = _decode_fields(records[1])
    assert ev[2] == [7]  # step
    summary = _decode_fields(ev[5][0])
    value = _decode_fields(summary[1][0])
    assert value[1] == [b"loss_step"]
    assert value[2] == [2.5]

    ev2 = _decode_fields(records[2])
    assert ev2[1] == [123.0] and ev2[2] == [3]
    value2 = _decode_fields(_decode_fields(ev2[5][0])[1][0])
    assert value2[1] == [b"epoch/miou val"]
    assert value2[2] == [0.625]


def test_make_writer_falls_back_to_native(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # writer creates ./runs/<stamp>_<host>
    w = make_writer(True, comment="_t")
    assert w is not None
    w.add_scalar("loss_G", 1.0, 0)
    w.close()
    files = glob.glob("runs/*_t/events.out.tfevents.*")
    assert len(files) == 1
    assert make_writer(False) is None

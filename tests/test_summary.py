"""TensorBoard event writer: records must be well-formed TFRecord framing
with valid masked CRC32C and decodable scalar events."""

import glob
import json
import os
import struct

import pytest

from yolov3_tensorflow_tpu.utils.summary import (SummaryWriter, _masked_crc,
                                                 crc32c)


def test_crc32c_known_vectors():
    # canonical check value + RFC 3720 vector
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(range(32))) == 0x46DD794E


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header CRC mismatch"
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload), "payload CRC mismatch"
            records.append(payload)
    return records


def test_event_file_structure(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.scalar("loss/total", 1.5, step=3)
    w.scalar("lr", 1e-4, step=3)
    w.close()

    event_files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(event_files) == 1
    records = _read_records(event_files[0])
    assert len(records) == 3  # file_version + 2 scalars
    assert b"brain.Event" in records[0]
    assert b"loss/total" in records[1]
    assert b"lr" in records[2]
    # fp32 1.5 little-endian must appear in the scalar event
    assert struct.pack("<f", 1.5) in records[1]

    # JSONL mirror
    with open(tmp_path / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f]
    assert rows[0]["tag"] == "loss/total" and rows[0]["value"] == 1.5
    assert rows[1]["step"] == 3

"""Minimal TensorBoard event-file writer (no tensorboard/tensorflow dep).

The reference logs training scalars through the HF Trainer's TensorBoard
integration and reads them back with ``scripts/read_tensorboard.py`` (C11),
and lmms-eval ships a WandbLogger (C33).  This module writes genuine
``events.out.tfevents.*`` files — the TFRecord framing + Event/Summary
protobufs encoded by hand (both formats are stable, versioned public wire
formats) — so existing TensorBoard installs and the reference's own reader
tooling work against our runs without us depending on TF.

Wire formats implemented:
  - TFRecord: <len u64><masked crc32c of len><payload><masked crc32c of payload>
  - Event proto: field 1 wall_time (double), 2 step (int64), 5 summary
  - Summary proto: repeated field 1 value; Value: field 1 tag (string),
    2 simple_value (float)

Use ``TensorBoardWriter`` directly or ``metrics_jsonl_to_tensorboard`` to
convert an existing metrics.jsonl produced by the trainer.
"""

from __future__ import annotations

import os
import socket
import struct
import time


# ---------------------------------------------------------------------------
# crc32c (Castagnoli) — table-driven, the variant TFRecord masks
# ---------------------------------------------------------------------------

def _make_table():
    poly = 0x82F63B78
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_TABLE = _make_table()


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# protobuf wire encoding (only what Event/Summary need)
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _double(num: int, val: float) -> bytes:
    return _field(num, 1) + struct.pack("<d", val)


def _float(num: int, val: float) -> bytes:
    return _field(num, 5) + struct.pack("<f", val)


def _int64(num: int, val: int) -> bytes:
    return _field(num, 0) + _varint(val & 0xFFFFFFFFFFFFFFFF)


def _bytes(num: int, val: bytes) -> bytes:
    return _field(num, 2) + _varint(len(val)) + val


def encode_scalar_event(tag: str, value: float, step: int,
                        wall_time: float | None = None) -> bytes:
    value_msg = _bytes(1, tag.encode()) + _float(2, float(value))
    summary = _bytes(1, value_msg)
    event = (_double(1, wall_time if wall_time is not None else time.time())
             + _int64(2, int(step)) + _bytes(5, summary))
    return event


def encode_file_version(wall_time: float | None = None) -> bytes:
    return (_double(1, wall_time if wall_time is not None else time.time())
            + _bytes(3, b"brain.Event:2"))


def tfrecord(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", masked_crc(header)) + payload
            + struct.pack("<I", masked_crc(payload)))


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

class TensorBoardWriter:
    """Append-only scalar event writer, file layout TensorBoard discovers."""

    def __init__(self, logdir: str, suffix: str = ""):
        os.makedirs(logdir, exist_ok=True)
        name = (f"events.out.tfevents.{int(time.time())}."
                f"{socket.gethostname()}{suffix}")
        self.path = os.path.join(logdir, name)
        self._f = open(self.path, "ab")
        self._f.write(tfrecord(encode_file_version()))

    def add_scalar(self, tag: str, value: float, step: int,
                   wall_time: float | None = None):
        self._f.write(tfrecord(encode_scalar_event(tag, value, step,
                                                   wall_time)))

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def metrics_jsonl_to_tensorboard(metrics_path: str, logdir: str,
                                 prefix: str = "train/") -> str:
    """Convert a trainer metrics.jsonl into an event file; returns its path.

    Tags mirror the reference's HF-Trainer scalars (e.g.
    ``train/rewards/accuracy_reward``, read back by
    scripts/read_tensorboard.py:22-45)."""
    import json

    with TensorBoardWriter(logdir) as tb:
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                step = int(rec.get("step", 0))
                for key, val in rec.items():
                    if isinstance(val, (int, float)) and key != "step":
                        tb.add_scalar(prefix + key, float(val), step)
        return tb.path


def _read_varint(buf, pos):
    """Decode a protobuf varint at ``pos``; returns (value, new_pos)."""
    v = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return v, pos


def read_scalars(path: str) -> dict:
    """Parse an event file back into {tag: [(step, value)]} — the
    scripts/read_tensorboard.py capability, TF-free (C11)."""
    out: dict = {}
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        payload = data[pos + 12:pos + 12 + length]
        pos += 12 + length + 4
        step, wall, tag, val = 0, 0.0, None, None
        p = 0
        while p < len(payload):
            key = payload[p]
            p += 1
            field, wire = key >> 3, key & 7
            if wire == 1:
                (v,) = struct.unpack_from("<d", payload, p)
                p += 8
                if field == 1:
                    wall = v
            elif wire == 0:
                v, p = _read_varint(payload, p)
                if field == 2:
                    step = v
            elif wire == 2:
                ln, p = _read_varint(payload, p)
                sub = payload[p:p + ln]
                p += ln
                if field == 5:  # summary -> values
                    q = 0
                    while q < len(sub):
                        k2 = sub[q]
                        q += 1
                        l2, q = _read_varint(sub, q)
                        if k2 >> 3 == 1:
                            vmsg = sub[q:q + l2]
                            q += l2
                            r = 0
                            while r < len(vmsg):
                                k3 = vmsg[r]
                                r += 1
                                if k3 >> 3 == 1 and k3 & 7 == 2:
                                    # tag length is a varint: one raw byte
                                    # breaks on tags >= 128 chars
                                    l3, r = _read_varint(vmsg, r)
                                    tag = vmsg[r:r + l3].decode()
                                    r += l3
                                elif k3 >> 3 == 2 and k3 & 7 == 5:
                                    (val,) = struct.unpack_from("<f", vmsg, r)
                                    r += 4
                                else:
                                    break
                        else:
                            q += l2
            else:
                break
        if tag is not None and val is not None:
            out.setdefault(tag, []).append((step, float(val)))
    return out

#!/usr/bin/env python
"""Independent zarr v2 reader — numpy-only cross-verification of a
graft ZarrStore group (no zarr library needed): walks every array in
the group via .zmetadata (or per-array .zarray), decodes each chunk
exactly per the v2 spec (C-order, little-endian, optional gzip, edge
chunks stored full-size and trimmed to the array bounds), reassembles
the full array, and prints shape / dtype / int64 sum per array — the
same figures a formula oracle can check.

Usage: python tools/zarr_check.py <group_dir>
"""
import gzip
import json
import os
import re
import sys

import numpy as np

root = sys.argv[1]

def load_meta():
    zm = os.path.join(root, ".zmetadata")
    if os.path.exists(zm):
        meta = json.load(open(zm))["metadata"]
        return {k.split("/")[0]: v for k, v in meta.items()
                if k.endswith("/.zarray")}
    out = {}
    for name in sorted(os.listdir(root)):
        za = os.path.join(root, name, ".zarray")
        if os.path.isdir(os.path.join(root, name)) and os.path.exists(za):
            out[name] = json.load(open(za))
    return out

for name, za in sorted(load_meta().items()):
    assert za["zarr_format"] == 2, za
    assert za.get("order", "C") == "C", za
    assert not za.get("filters"), f"filters unsupported: {za}"
    comp = za.get("compressor")
    assert comp is None or comp.get("id") == "gzip", comp
    dt = np.dtype(za["dtype"])
    shape, chunks = za["shape"], za["chunks"]
    grid = [(s + c - 1) // c for s, c in zip(shape, chunks)]
    full = np.zeros(shape, dtype=dt)
    n_chunks = 0
    adir = os.path.join(root, name)
    for fname in os.listdir(adir):
        if not re.fullmatch(r"\d+(\.\d+)*", fname):
            continue
        idx = list(map(int, fname.split(".")))
        assert len(idx) == len(shape), fname
        raw = open(os.path.join(adir, fname), "rb").read()
        if comp is not None:
            raw = gzip.decompress(raw)
        blk = np.frombuffer(raw, dtype=dt).reshape(chunks)
        sel = tuple(slice(i * c, min((i + 1) * c, s))
                    for i, c, s in zip(idx, chunks, shape))
        trim = tuple(slice(0, sl.stop - sl.start) for sl in sel)
        full[sel] = blk[trim]
        n_chunks += 1
    expect = 1
    for g in grid:
        expect *= g
    assert n_chunks == expect, f"{name}: {n_chunks} chunks, grid implies {expect}"
    # sum over a lossless int view so float payloads checksum exactly
    s = int(full.view(np.int64).sum()) if dt.itemsize == 8 and dt.kind == "f" \
        else int(full.real.sum()) if dt.kind == "c" else int(full.sum())
    print(f"{name}: shape={tuple(full.shape)} dtype={za['dtype']} "
          f"chunks={n_chunks} sum={s}")
print("OK: independent numpy reader decoded every array")

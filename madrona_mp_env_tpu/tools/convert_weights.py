"""Orbax checkpoint -> raw per-policy weight arrays.

Equivalent of the reference's scripts/convert_weights.py, which exports
policy weights to the flat binary format its in-engine C++ DNN evaluator
loads (reference src/dnn.cpp loadPolicyWeights): one file per parameter,
``int32 ndim, int32 shape[ndim-1], float data`` with the leading policy
axis split into per-policy directories.

Usage: python -m madrona_mp_env_tpu.tools.convert_weights \\
    <ckpt_path> <out_dir>
"""

from __future__ import annotations

import os
import sys

import numpy as np


def save_arrays(d, out_dir: str, prefix: str = "", verbose: bool = True):
    for key, value in d.items():
        new_prefix = f"{prefix}_{key}" if prefix else key
        if isinstance(value, dict):
            save_arrays(value, out_dir, prefix=new_prefix, verbose=verbose)
            continue
        if value is None:
            continue
        value = np.asarray(value)
        if value.ndim < 2:
            continue
        # leading axis = policy index
        for i in range(value.shape[0]):
            file_dir = os.path.join(out_dir, str(i))
            os.makedirs(file_dir, exist_ok=True)
            filename = os.path.join(file_dir, new_prefix)
            if i == 0 and verbose:
                print(f"Saving {filename}... {value[i].shape} {value.dtype}")
            with open(filename, "wb") as f:
                np.array([value.ndim - 1], dtype=np.int32).tofile(f)
                np.array(value.shape[1:], dtype=np.int32).tofile(f)
                value[i].tofile(f)


def convert(ckpt_path: str, out_dir: str, verbose: bool = True) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(os.path.realpath(ckpt_path))
    save_arrays(state["params"], out_dir, verbose=verbose)


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])

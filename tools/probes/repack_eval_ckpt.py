"""Repack a full training checkpoint into a small eval-only checkpoint
(params for one policy + normalizer + elo) loadable by
train.infer.eval_load_ckpt — the committed-artifact format used by the
round-2/round-5 learning-evidence runs.

Usage: python tools/probes/repack_eval_ckpt.py <full_ckpt_dir> <out_dir> [policy]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")


def main():
    src, dst = sys.argv[1], sys.argv[2]
    pol = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from madrona_mp_env_tpu.train.infer import eval_load_ckpt

    params, normalizer, elo, num_policies = eval_load_ckpt(
        src, single_policy=pol
    )
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(
        os.path.abspath(dst),
        {
            "params": jax.tree_util.tree_map(np.asarray, params),
            "normalizer": jax.tree_util.tree_map(np.asarray, normalizer),
            "elo": np.asarray(elo),
        },
        force=True,
    )
    print(f"saved policy {pol} of {num_policies} -> {dst}")


if __name__ == "__main__":
    main()

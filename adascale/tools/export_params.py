"""Export inference params from a training checkpoint as one compact .npz.

The orbax checkpoint carries params + optimizer state (~382 MB for
tiny/FPN); serving needs only the params, and float16 storage halves them
again (~68 MB) — small enough to commit, so a fresh clone can evaluate the
flagship model without re-training (the reference's equivalent artifact
chain is state_dict -> torch.jit.save, train.py:635-644).

The flat key format ("a/b/c" -> nested dict) matches the test fixtures
(tests/fixtures/overfit_micro_params.npz) and engine.load_params loads it
directly. f16 storage round-trips through float32 at load; measure the
quality delta with eval_checkpoint before trusting a precision-sensitive
result (REPRODUCE.md records it for the flagship).

Usage:
  python -m adascale.tools.export_params --checkpoint run/state_39 \
      --out flagship_params.npz [--dtype float16]
"""
from __future__ import annotations

import argparse


def flatten_params(tree, prefix=""):
    import numpy as np

    flat = {}
    for key, value in tree.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(value, dict):
            flat.update(flatten_params(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True, help="orbax state dir")
    parser.add_argument("--out", required=True, help="output .npz path")
    parser.add_argument(
        "--dtype",
        default="float16",
        choices=["float16", "float32"],
        help="storage dtype for float leaves (f16 halves the file; load "
        "casts back to f32)",
    )
    args = parser.parse_args()

    import numpy as np

    from ..training.checkpoint import restore_pytree_numpy

    restored = restore_pytree_numpy(args.checkpoint)
    params = restored["params"] if "params" in restored else restored
    flat = flatten_params(params)
    out = {}
    n_bytes_in = n_bytes_out = 0
    for key, value in flat.items():
        n_bytes_in += value.nbytes
        if args.dtype == "float16" and value.dtype == np.float32:
            value = value.astype(np.float16)
        out[key] = value
        n_bytes_out += value.nbytes
    np.savez_compressed(args.out, **out)
    import os

    print(
        f"{args.out}: {len(out)} arrays, {n_bytes_in / 1e6:.1f} MB params "
        f"-> {n_bytes_out / 1e6:.1f} MB ({args.dtype}) "
        f"-> {os.path.getsize(args.out) / 1e6:.1f} MB compressed"
    )


if __name__ == "__main__":
    main()

"""Re-test the fused spectral kernel at the BATCH operating point.

VERDICT r4 item 4: the round-3/4 fused-spectral rejection (xRT 146.5 vs
169.7, design.md §4) was measured SINGLE-clip, where its two extra kernel
launches per iteration dominate. The production bench path is batch-8
(one launch serves all clips in the batched grid), which changes the
launch-overhead economics 8x -- this probe measures both settings on the
same batched harness so the §4 account can be closed with numbers either
way.

Usage (hardware): python tools/fuse_batch_probe.py [--batch 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench
    from pyfasst_tpu.tf.stft import sine_window
    from pyfasst_tpu.utils.config import GEMConfig

    nsamples = int(bench.FS * bench.DUR)
    window = jnp.asarray(sine_window(bench.WLEN), jnp.float32)
    batch = args.batch or bench.BATCH

    for fuse in (False, True):
        cfg = GEMConfig(niter=bench.NITER, fuse_spectral=fuse)
        best = 0.0
        for r in range(args.repeat):
            xrt = bench._run_batched(cfg, window, nsamples, batch)
            best = max(best, xrt)
            print(json.dumps({"fuse_spectral": fuse, "rep": r,
                              "batch": batch,
                              "xrt": round(float(xrt), 1)}), flush=True)
        print(json.dumps({"fuse_spectral": fuse, "batch": batch,
                          "best_xrt": round(float(best), 1)}), flush=True)


if __name__ == "__main__":
    main()

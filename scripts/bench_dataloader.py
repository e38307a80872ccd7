#!/usr/bin/env python
"""Training dataloader throughput (reference lib/dataloader_demo.py:46-48:
2 it/s with precomputed SMPL features, 1.5 it/s online, CPU workers).

Generates the synthetic fixture if no dataset root is given, then iterates
batches (full SMPL feature computation: fit load + noise + LBS + projection
+ Hoppe labels + vf tables) and prints it/s.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batches", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from icon_tpu.data.fixture import fixture_config, make_synthetic_dataset
    from icon_tpu.data.datasets import DataLoader, PIFuDataset

    root = args.root
    if not root:
        root = "/tmp/bench_loader_ds"
        if not os.path.isdir(os.path.join(root, "synth")):
            print("[bench_dataloader] generating synthetic fixture...")
            make_synthetic_dataset(root, n_subjects=4, n_views=4, size=128)

    cfg = fixture_config(root, n_views=4, num_sample_geo=8000,
                         image_size=128)
    ds = PIFuDataset(cfg, split="train")
    loader = DataLoader(ds, batch_size=args.batch_size,
                        num_workers=args.workers)
    _ = ds[0]                 # warm the jitted fit forward + mesh caches
    n = 0
    t0 = time.perf_counter()
    for epoch in range(100):
        loader.set_epoch(epoch)
        for batch in loader:
            n += 1
            if n >= args.batches:
                break
        if n >= args.batches:
            break
    dt = time.perf_counter() - t0
    print(f"{n} batches (bs {args.batch_size}, {args.workers} workers) in "
          f"{dt:.1f}s -> {n / dt:.2f} it/s "
          f"(reference: 2 it/s precomputed, 1.5 it/s online)")


if __name__ == "__main__":
    main()

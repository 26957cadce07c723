"""Build the {split}.h5 pre-chunked dataset consumed by SEH5Dataset.

The reference consumes 'data'/'label' H5 datasets of fixed-size chunk pairs
(ref se_dataset.py:527-568) but ships no builder; this tool creates them from paired
clean/noisy wav dirs using the same slicing/normalize/pre-emphasis chain as SEDataset.

Usage:
  python tools/make_h5.py --clean_dir <dir> --noisy_dir <dir> --out_dir <dir> \
      --split train [--slice_size 16384] [--stride 0.5] [--preemph 0.95]

NOTE on naming: SEH5Dataset reads clean chunks from 'data' and noisy from 'label'
(ref se_dataset.py:556-557 assigns data->clean, label->noisy); we write accordingly.
"""
import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clean_dir", required=True)
    p.add_argument("--noisy_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--slice_size", type=int, default=16384)
    p.add_argument("--stride", type=float, default=0.5)
    p.add_argument("--preemph", type=float, default=0.95)
    p.add_argument("--cache_dir", default="/tmp/make_h5_cache")
    args = p.parse_args()

    import os

    import h5py

    from segan_pytorch_tpu.data import SEDataset, DataLoader

    ds = SEDataset(args.clean_dir, args.noisy_dir, args.preemph,
                   cache_dir=args.cache_dir, split=args.split,
                   slice_size=args.slice_size, stride=args.stride, verbose=True)
    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"{args.split}.h5")
    n = len(ds)
    with h5py.File(out, "w") as f:
        dset_c = f.create_dataset("data", (n, args.slice_size, 1), np.float32)
        dset_n = f.create_dataset("label", (n, args.slice_size, 1), np.float32)
        loader = DataLoader(ds, batch_size=256, shuffle=False, num_workers=2,
                            pad_final=False)
        i = 0
        for batch in loader:
            b = batch["clean"].shape[0]
            dset_c[i : i + b] = batch["clean"][..., None]
            dset_n[i : i + b] = batch["noisy"][..., None]
            i += b
            print(f"\r{i}/{n} chunks", end="")
    print(f"\nWrote {out} with {n} chunk pairs")


if __name__ == "__main__":
    main()

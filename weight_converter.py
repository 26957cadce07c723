"""Convert checkpoints: torch SEGAN .ckpt -> native npz tree (and legacy-name migration).

Replaces both reference tools:
- weightG_fmt_converter.py (gen_enc/gen_dec -> enc_blocks/dec_blocks renaming, :30-42)
- the implicit torch->framework load in clean.py

Usage: python weight_converter.py <torch ckpt> [--out out.ckpt] [--which G|D]
"""
import argparse
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('ckpt_file', type=str)
    parser.add_argument('--out', type=str, default=None)
    parser.add_argument('--which', type=str, default='G', choices=['G', 'D'])
    parser.add_argument('--dpool_slen', type=int, default=16)
    parser.add_argument('--last_fmaps', type=int, default=1024)
    opts = parser.parse_args()

    from segan_pytorch_tpu.utils.checkpoint import (
        load_torch_generator,
        load_torch_discriminator,
        save_pytree,
    )

    if opts.which == 'G':
        tree = load_torch_generator(opts.ckpt_file)
    else:
        tree = load_torch_discriminator(opts.ckpt_file, opts.dpool_slen,
                                        opts.last_fmaps)
    out = opts.out or (opts.ckpt_file + '.jax')
    save_pytree(out, {"state_dict": tree}, meta={"source": opts.ckpt_file})
    import os
    if os.path.exists(out + '.npz'):
        os.replace(out + '.npz', out)
    print(f'Wrote {out}')


if __name__ == '__main__':
    main()

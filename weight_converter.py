"""Convert checkpoints between the torch reference format and our npz trees.

Replaces both reference tools and adds the reverse direction:
- weightG_fmt_converter.py (gen_enc/gen_dec -> enc_blocks/dec_blocks renaming, :30-42)
- the implicit torch->framework load in clean.py
- `--to_torch`: export a framework checkpoint back to the reference's
  torch.save({'step','state_dict'}) format, loadable by the upstream repo's
  clean.py / load_pretrained (ref core.py:120-151)

Usage:
    python weight_converter.py <torch ckpt> [--out out.ckpt] [--which G|D]
    python weight_converter.py <our ckpt> --to_torch [--out out.ckpt] [--which G|D]
"""
import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('ckpt_file', type=str)
    parser.add_argument('--out', type=str, default=None)
    parser.add_argument('--which', type=str, default='G', choices=['G', 'D'])
    parser.add_argument('--to_torch', action='store_true', default=False,
                        help='reverse direction: framework npz ckpt -> '
                             'reference torch format')
    parser.add_argument('--dpool_slen', type=int, default=16)
    parser.add_argument('--last_fmaps', type=int, default=1024)
    opts = parser.parse_args()

    from segan_pytorch_tpu.utils.checkpoint import (
        export_torch_discriminator,
        export_torch_generator,
        load_pytree,
        load_torch_discriminator,
        load_torch_generator,
        save_pytree,
    )

    if opts.to_torch:
        payload, meta = load_pytree(opts.ckpt_file)
        tree = payload.get('state_dict', payload)
        step = int((meta or {}).get('step', 0))
        out = opts.out or (opts.ckpt_file + '.torch')
        if opts.which == 'G':
            export_torch_generator(tree, out, step=step)
        else:
            export_torch_discriminator(tree, out, opts.dpool_slen,
                                       opts.last_fmaps, step=step)
        print(f'Wrote {out}')
        return

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

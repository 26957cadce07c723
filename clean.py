"""Enhancement (inference) CLI — mirrors ref clean.py:28-110: rebuild the model from a
train.opts JSON, load the generator checkpoint (torch .ckpt or native), and enhance every
wav in test_files via chunked (SEGAN) or full-pass (WSEGAN) inference."""
import argparse
import glob
import json
import os
import random
import timeit

import numpy as np


def main(opts):
    assert opts.cfg_file is not None
    assert opts.test_files is not None
    assert opts.g_pretrained_ckpt is not None

    from segan_pytorch_tpu.utils.engine import build_enhancement_engine
    from segan_pytorch_tpu.data.wav_io import read_wav_raw, write_wav
    from segan_pytorch_tpu.ops.signal import normalize_wave_minmax, pre_emphasize_np

    cfg, segan = build_enhancement_engine(opts.cfg_file, opts.g_pretrained_ckpt,
                                          opts.seed)
    print('Loaded train config: ')
    print(cfg.to_json())

    if opts.h5:
        import h5py

        # Enhance the NOISY chunks ('label' per the SEH5Dataset contract; the
        # reference reads 'data' — the clean signal — at clean.py:47-48, which we
        # treat as a bug). H5 chunks are stored already normalized+pre-emphasized
        # (tools/make_h5.py), so no second pre-emphasis is applied below.
        with h5py.File(opts.test_files[0], 'r') as f:
            key = 'label' if 'label' in f else 'data'
            twavs = f[key][:]
    else:
        if len(opts.test_files) == 1:
            twavs = sorted(glob.glob(os.path.join(opts.test_files[0], '*.wav')))
        else:
            twavs = opts.test_files
    print('Cleaning {} wavs'.format(len(twavs)))

    def _write(out_path, g_wav):
        if opts.soundfile:
            write_wav(out_path, g_wav, 16000, subtype='pcm16')
        else:
            write_wav(out_path, g_wav, 16000, subtype='float')

    B = max(1, int(getattr(opts, 'batch_utts', 1)))
    if B > 1 and not opts.h5:
        # throughput mode: B utterances become ONE device batch — SEGAN
        # concatenates chunk grids (generate_batch); WSEGAN groups utterances
        # of equal make_div_n-padded length. Equals the sequential loop to 1 ulp
        beg_t = timeit.default_timer()
        for lo in range(0, len(twavs), B):
            group = twavs[lo: lo + B]
            wavs, names = [], []
            for twav in group:
                rate, wav = read_wav_raw(twav)
                wav = np.asarray(normalize_wave_minmax(np.asarray(wav)))
                wavs.append(pre_emphasize_np(wav, cfg.preemph))
                names.append(os.path.basename(twav))
            for tbname, (g_wav, _) in zip(
                    names, segan.generate_batch(wavs, overlap=opts.overlap)):
                _write(os.path.join(opts.synthesis_path, tbname), g_wav)
            end_t = timeit.default_timer()
            print('Cleaned {}/{} (batch of {}) in {} s'.format(
                min(lo + B, len(twavs)), len(twavs), len(group), end_t - beg_t))
            beg_t = timeit.default_timer()
        return

    beg_t = timeit.default_timer()
    for t_i, twav in enumerate(twavs, start=1):
        if not opts.h5:
            tbname = os.path.basename(twav)
            rate, wav = read_wav_raw(twav)
            wav = np.asarray(normalize_wave_minmax(np.asarray(wav)))
            wav = pre_emphasize_np(wav, cfg.preemph)
        else:
            tbname = 'tfile_{}.wav'.format(t_i)
            wav = np.asarray(twav, np.float32).reshape(-1)
            twav = tbname
        g_wav, g_c = segan.generate(wav, overlap=opts.overlap)
        out_path = os.path.join(opts.synthesis_path, tbname)
        if opts.soundfile:
            write_wav(out_path, g_wav, 16000, subtype='pcm16')
        else:
            write_wav(out_path, g_wav, 16000, subtype='float')
        end_t = timeit.default_timer()
        print('Cleaned {}/{}: {} in {} s'.format(t_i, len(twavs), twav, end_t - beg_t))
        beg_t = timeit.default_timer()


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--g_pretrained_ckpt', type=str, default=None)
    parser.add_argument('--test_files', type=str, nargs='+', default=None)
    parser.add_argument('--h5', action='store_true', default=False)
    parser.add_argument('--seed', type=int, default=111)
    parser.add_argument('--overlap', type=float, default=0.0,
                        help='chunk overlap fraction in [0, 0.5): cross-fade '
                             'overlapping enhanced chunks (hann overlap-add) '
                             'instead of hard chunk boundaries; 0 = '
                             'reference-exact concatenation')
    parser.add_argument('--batch_utts', type=int, default=1,
                        help='>1: enhance this many utterances per device pass '
                             '(their chunk grids concatenate into ONE batch; '
                             'output equals sequential to 1 ulp). SEGAN only; '
                             'throughput mode for large offline jobs.')
    parser.add_argument('--synthesis_path', type=str, default='segan_samples')
    parser.add_argument('--soundfile', action='store_true', default=False,
                        help='Write PCM16 wavs (like the ref soundfile path, clean.py:76)')
    parser.add_argument('--cfg_file', type=str, default=None)
    opts = parser.parse_args()

    os.makedirs(opts.synthesis_path, exist_ok=True)
    random.seed(opts.seed)
    np.random.seed(opts.seed)
    main(opts)

"""Composite-metric evaluation of a noisy testset vs clean references
(ref eval_noisy_performance.py:12-67)."""
import argparse
import glob
import os
import timeit

import numpy as np


def main(opts):
    from segan_pytorch_tpu.data.wav_io import read_wav_16k
    from segan_pytorch_tpu.metrics import CompositeEval

    noisy_wavs = sorted(glob.glob(os.path.join(opts.test_wavs, '*.wav')))
    metrics = {'csig': [], 'cbak': [], 'covl': []}
    timings = []
    with open(opts.logfile, 'w') as out_log:
        out_log.write('FILE CSIG CBAK COVL PESQ SSNR\n')
        for n_i, noisy_wav in enumerate(noisy_wavs, start=1):
            bname = os.path.splitext(os.path.basename(noisy_wav))[0]
            clean_wav = os.path.join(opts.clean_wavs, bname + '.wav')
            noisy, _ = read_wav_16k(noisy_wav, 16000)
            clean, _ = read_wav_16k(clean_wav, 16000)
            beg_t = timeit.default_timer()
            csig, cbak, covl, pesq, ssnr = CompositeEval(clean, noisy, True)
            end_t = timeit.default_timer()
            timings.append(end_t - beg_t)
            metrics['csig'].append(csig)
            metrics['cbak'].append(cbak)
            metrics['covl'].append(covl)
            out_log.write('{} {:.3f} {:.3f} {:.3f} {:.3f} {:.3}\n'.format(
                bname + '.wav', csig, cbak, covl, pesq, ssnr))
            print('Processed {}/{} wav, CSIG:{:.3f} CBAK:{:.3f} COVL:{:.3f} '
                  'PESQ:{:.3f} SSNR:{:.3f} total time: {:.2f} s, mproc: {:.2f} s'
                  .format(n_i, len(noisy_wavs), csig, cbak, covl, pesq, ssnr,
                          np.sum(timings), np.mean(timings)))
    print('mean Csig: ', np.mean(metrics['csig']))
    print('mean Cbak: ', np.mean(metrics['cbak']))
    print('mean Covl: ', np.mean(metrics['covl']))


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('--test_wavs', type=str, default=None)
    parser.add_argument('--clean_wavs', type=str, default=None)
    parser.add_argument('--logfile', type=str, default=None)
    opts = parser.parse_args()
    assert opts.test_wavs is not None
    assert opts.clean_wavs is not None
    assert opts.logfile is not None
    main(opts)

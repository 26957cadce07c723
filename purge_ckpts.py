"""Checkpoint GC: delete all but the newest + current ckpt using the Saver JSON index
(ref purge_ckpts.py:7-29)."""
import argparse
import glob
import json
import os


def clean(opts):
    logs = glob.glob(os.path.join(opts.ckpt_dir, '*checkpoint*'))
    print(logs)
    for log in logs:
        with open(log, 'r') as log_f:
            log_ = json.load(log_f)
            for fname in log_['latest']:
                fpath = os.path.join(opts.ckpt_dir, 'weights_' + fname)
                assert os.path.exists(fpath), fpath
            to_rm = [l for l in log_['latest'][:-1] if l != log_['current']]
            to_kp = log_['latest'][-1]
            for fname in to_rm:
                fpath = os.path.join(opts.ckpt_dir, 'weights_' + fname)
                os.unlink(fpath)
                print('Removed file ', fpath)
            print('Kept file ', os.path.join(opts.ckpt_dir, 'weights_' + to_kp))
        with open(log, 'w') as log_f:
            log_['latest'] = [log_['latest'][-1]]
            log_f.write(json.dumps(log_, indent=2))


if __name__ == '__main__':
    parser = argparse.ArgumentParser()
    parser.add_argument('ckpt_dir', type=str, default=None)
    clean(parser.parse_args())

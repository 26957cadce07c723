"""SEGAN-TPU training CLI — full argparse surface of the reference (ref train.py:101-246),
plus TPU-native flags (--dp, --compute_dtype)."""
import argparse
import json
import os
import random

import numpy as np


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--save_path', type=str, default="seganv1_ckpt",
                        help="Path to save models (Def: seganv1_ckpt).")
    parser.add_argument('--d_pretrained_ckpt', type=str, default=None,
                        help='Path to ckpt file to pre-load in training (Def: None).')
    parser.add_argument('--g_pretrained_ckpt', type=str, default=None,
                        help='Path to ckpt file to pre-load in training (Def: None).')
    parser.add_argument('--cache_dir', type=str, default='data_cache')
    parser.add_argument('--clean_trainset', type=str, default='data/clean_trainset')
    parser.add_argument('--noisy_trainset', type=str, default='data/noisy_trainset')
    parser.add_argument('--clean_valset', type=str, default=None)
    parser.add_argument('--noisy_valset', type=str, default=None)
    parser.add_argument('--h5_data_root', type=str, default=None,
                        help='H5 data root dir (Def: None).')
    parser.add_argument('--h5', action='store_true', default=False,
                        help='Activate H5 dataset mode (Def: False).')
    parser.add_argument('--data_stride', type=float, default=0.5,
                        help='Stride in seconds for data read')
    parser.add_argument('--seed', type=int, default=111)
    parser.add_argument('--epoch', type=int, default=100)
    parser.add_argument('--patience', type=int, default=100,
                        help='Validation epochs to wait before early stop (Def: 100).')
    parser.add_argument('--batch_size', type=int, default=100)
    parser.add_argument('--save_freq', type=int, default=50,
                        help="Batch save freq (Def: 50).")
    parser.add_argument('--slice_size', type=int, default=16384)
    parser.add_argument('--opt', type=str, default='rmsprop')
    parser.add_argument('--l1_dec_epoch', type=int, default=100)
    parser.add_argument('--l1_weight', type=float, default=100,
                        help='L1 regularization weight (Def. 100).')
    parser.add_argument('--l1_dec_step', type=float, default=1e-5,
                        help='L1 regularization decay factor by batch (Def: 1e-5).')
    parser.add_argument('--g_lr', type=float, default=0.00005)
    parser.add_argument('--d_lr', type=float, default=0.00005)
    parser.add_argument('--preemph', type=float, default=0.95)
    parser.add_argument('--max_samples', type=int, default=None)
    parser.add_argument('--eval_workers', type=int, default=2)
    parser.add_argument('--slice_workers', type=int, default=1)
    parser.add_argument('--num_workers', type=int, default=1)
    parser.add_argument('--no-cuda', dest='no_cuda', action='store_true', default=False,
                        help='Kept for config compat; meaningless on TPU')
    parser.add_argument('--random_scale', type=float, nargs='+', default=[1])
    parser.add_argument('--no_train_gen', action='store_true', default=False)
    parser.add_argument('--preemph_norm', action='store_true', default=False)
    parser.add_argument('--wsegan', action='store_true', default=False)
    parser.add_argument('--aewsegan', action='store_true', default=False)
    parser.add_argument('--vanilla_gan', action='store_true', default=False)
    parser.add_argument('--no_bias', action='store_true', default=False)
    parser.add_argument('--n_fft', type=int, default=2048)
    parser.add_argument('--reg_loss', type=str, default='l1_loss',
                        help='Regression loss (l1_loss or mse_loss) in G (Def: l1_loss)')
    # Skip connections
    parser.add_argument('--skip_merge', type=str, default='concat')
    parser.add_argument('--skip_type', type=str, default='alpha')
    parser.add_argument('--skip_init', type=str, default='one')
    parser.add_argument('--skip_kwidth', type=int, default=11)
    # Generator
    parser.add_argument('--gkwidth', type=int, default=31)
    parser.add_argument('--genc_fmaps', type=int, nargs='+',
                        default=[64, 128, 256, 512, 1024])
    parser.add_argument('--genc_poolings', type=int, nargs='+', default=[4, 4, 4, 4, 4])
    parser.add_argument('--z_dim', type=int, default=1024)
    parser.add_argument('--gdec_fmaps', type=int, nargs='+', default=None)
    parser.add_argument('--gdec_poolings', type=int, nargs='+', default=None)
    parser.add_argument('--gdec_kwidth', type=int, default=None)
    parser.add_argument('--gnorm_type', type=str, default=None)
    parser.add_argument('--no_z', action='store_true', default=False)
    parser.add_argument('--no_skip', action='store_true', default=False)
    parser.add_argument('--pow_weight', type=float, default=0.001)
    parser.add_argument('--misalign_pair', action='store_true', default=False)
    parser.add_argument('--interf_pair', action='store_true', default=False)
    # Discriminator
    parser.add_argument('--denc_fmaps', type=int, nargs='+',
                        default=[64, 128, 256, 512, 1024])
    parser.add_argument('--dpool_type', type=str, default='none')
    parser.add_argument('--dpool_slen', type=int, default=16)
    parser.add_argument('--dkwidth', type=int, default=None)
    parser.add_argument('--denc_poolings', type=int, nargs='+', default=[4, 4, 4, 4, 4])
    parser.add_argument('--dnorm_type', type=str, default='bnorm')
    parser.add_argument('--phase_shift', type=int, default=5)
    parser.add_argument('--sinc_conv', action='store_true', default=False)
    # TPU-native extensions
    parser.add_argument('--dp', type=int, default=1,
                        help='Data-parallel shards over the device mesh (Def: 1).')
    parser.add_argument('--mp', type=int, default=1,
                        help='Tensor-parallel degree: builds a (data, model) '
                             'mesh and Megatron-shards the D head FC over '
                             '"model" (Def: 1 = off).')
    parser.add_argument('--compute_dtype', type=str, default='float32',
                        help='float32 | bfloat16 network compute dtype.')
    parser.add_argument('--use_pallas', action='store_true', default=False)
    parser.add_argument('--deconv_impl', type=str, default=None,
                        choices=['dilated', 'blocked', 'edge-blocked', 'phased'],
                        help='Decoder transposed-conv lowering; default None = '
                             'engine choice (dilated, except AEWSEGAN which '
                             'defaults to edge-blocked — BENCH.md r4 matrix). '
                             'All lowerings are mathematically identical.')
    parser.add_argument('--profile', action='store_true', default=False,
                        help='Capture a device trace into save_path/profile and '
                             'log per-step MFU + device memory stats.')
    parser.add_argument('--eval_max_samples', type=int, default=1,
                        help='Validation batches scored per epoch '
                             '(1 = reference parity, 0 = full valset sweep).')
    parser.add_argument('--steps_per_call', type=int, default=1,
                        help='Train steps per dispatched program (lax.scan; '
                             'bit-equal per step). All engines; single-process. '
                             'Measured +2%% (WSEGAN b150) / +1.3%% (SEGAN+ b300).')
    parser.add_argument('--io_threads', type=int, default=0,
                        help='Native wav-gather thread-pool size '
                             '(0 = hardware concurrency).')
    parser.add_argument('--shuffle_buffer', type=int, default=0,
                        help='>0: streaming bounded-buffer shuffle of that many '
                             'slices per shard instead of a global shuffle '
                             '(corpora too large for a global index; drops the '
                             'ragged tail).')
    parser.add_argument('--shuffle_buffer_mode', type=str, default='sharded',
                        choices=['sharded', 'global'],
                        help="'sharded': independent per-shard buffers (most "
                             "sequential IO); 'global': every shard replays one "
                             "buffered walk and takes its rows — assembled "
                             "batches bit-identical to single-host.")
    parser.add_argument('--loader_dtype', type=str, default=None,
                        help="Cast clean/noisy at collate time (e.g. 'bfloat16' "
                             'to halve host->device bytes under bf16 compute).')
    parser.add_argument('--noises_dir', type=str, default=None,
                        help='Dir of noise wavs: activates on-the-fly additive-noise '
                             'augmentation (P.56 ASL scaling, ref utils.py:51-134); '
                             'noisy slices are regenerated from clean each epoch.')
    parser.add_argument('--snr_levels', type=int, nargs='+', default=[0, 5, 10],
                        help='Candidate SNR targets (dB) for --noises_dir '
                             'augmentation (Def: 0 5 10).')
    parser.add_argument('--resume', action='store_true', default=False,
                        help='Resume from the latest EOE checkpoints in save_path.')
    # multi-host bring-up (jax.distributed); no-ops for single process
    parser.add_argument('--eoe_save_every', type=int, default=1,
                        help='Save EOE checkpoints every N epochs (Def: 1).')
    parser.add_argument('--coordinator', type=str, default=None,
                        help='Multi-host coordinator address host:port (Def: None).')
    parser.add_argument('--num_processes', type=int, default=None,
                        help='Total number of training processes (Def: None).')
    parser.add_argument('--process_id', type=int, default=None,
                        help='This process index in [0, num_processes) (Def: None).')
    return parser


def main(cfg):
    import jax

    from segan_pytorch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from segan_pytorch_tpu.data import SEDataset, SEH5Dataset, DataLoader
    from segan_pytorch_tpu.models import SEGAN, WSEGAN, AEWSEGAN

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    from segan_pytorch_tpu.parallel import initialize_distributed
    initialize_distributed(getattr(cfg, 'coordinator', None),
                           getattr(cfg, 'num_processes', None),
                           getattr(cfg, 'process_id', None))

    if jax.process_count() > 1 and cfg.dp <= 1:
        # without a global mesh each process would silently train its OWN replica
        # on its data shard (no gradient all-reduce); multi-host implies DP over
        # every device in the job
        cfg.dp = len(jax.devices())
        print(f'[multi-host] {jax.process_count()} processes: defaulting --dp to '
              f'the {cfg.dp} global devices')

    if cfg.wsegan:
        segan = WSEGAN(cfg)
    elif cfg.aewsegan:
        segan = AEWSEGAN(cfg)
    else:
        segan = SEGAN(cfg)
    if segan.cfg is not cfg:
        # the engine resolved engine-default knobs into a config copy (e.g.
        # AEWSEGAN's deconv_impl='edge-blocked'); re-dump train.opts so the
        # recorded file matches the effective lowering set
        from segan_pytorch_tpu.utils.config import dump_train_opts
        cfg = segan.cfg
        dump_train_opts(cfg)
    segan.init_state(jax.random.PRNGKey(cfg.seed), batch_size=cfg.batch_size)
    print('Total model parameters: ', segan.get_n_params())
    if cfg.resume:
        segan.resume(cfg.save_path)
    if cfg.g_pretrained_ckpt is not None:
        segan.g_load_pretrained(cfg.g_pretrained_ckpt, True)
    if cfg.d_pretrained_ckpt is not None:
        segan.d_load_pretrained(cfg.d_pretrained_ckpt, True)

    if cfg.h5:
        if cfg.h5_data_root is None:
            raise ValueError('Please specify an H5 data root')
        dset = SEH5Dataset(cfg.h5_data_root, split='train', preemph=cfg.preemph,
                           verbose=True, random_scale=cfg.random_scale)
    else:
        transform = None
        if getattr(cfg, 'noises_dir', None):
            from segan_pytorch_tpu.data.augment import Additive
            transform = Additive(cfg.noises_dir, cfg.snr_levels,
                                 rng=np.random.RandomState(cfg.seed))
            print(f'[augment] additive noise from {cfg.noises_dir} at SNR '
                  f'{cfg.snr_levels} dB ({len(transform.noises)} noise files)')
        dset = SEDataset(cfg.clean_trainset, cfg.noisy_trainset, cfg.preemph,
                         cache_dir=cfg.cache_dir, split='train',
                         stride=cfg.data_stride, slice_size=cfg.slice_size,
                         max_samples=cfg.max_samples, verbose=True,
                         slice_workers=cfg.slice_workers,
                         preemph_norm=cfg.preemph_norm,
                         random_scale=cfg.random_scale,
                         transform=transform,
                         io_threads=getattr(cfg, 'io_threads', 0))
    # multi-host: every process walks the identical seeded shuffle and loads only
    # its rows of each global batch (assembled on device by device_prefetch via
    # make_array_from_process_local_data)
    dloader = DataLoader(dset, batch_size=cfg.batch_size, shuffle=True,
                         num_workers=cfg.num_workers, seed=cfg.seed,
                         shard_id=jax.process_index(),
                         num_shards=jax.process_count(),
                         shuffle_buffer=getattr(cfg, 'shuffle_buffer', 0),
                         shuffle_buffer_mode=getattr(cfg, 'shuffle_buffer_mode',
                                                     'sharded'),
                         emit_dtype=getattr(cfg, 'loader_dtype', None))
    if cfg.clean_valset is not None:
        if cfg.h5:
            va_dset = SEH5Dataset(cfg.h5_data_root, split='valid',
                                  preemph=cfg.preemph, verbose=True)
        else:
            va_dset = SEDataset(cfg.clean_valset, cfg.noisy_valset, cfg.preemph,
                                cache_dir=cfg.cache_dir, split='valid',
                                stride=cfg.data_stride, slice_size=cfg.slice_size,
                                max_samples=cfg.max_samples, verbose=True,
                                slice_workers=cfg.slice_workers,
                                preemph_norm=cfg.preemph_norm,
                                io_threads=getattr(cfg, 'io_threads', 0))
        va_dloader = DataLoader(va_dset, batch_size=300, shuffle=False,
                                num_workers=cfg.num_workers, seed=cfg.seed)
    else:
        va_dloader = None
    # align first-dispatch arrivals across processes (no-op single-process):
    # gloo's context-creation KV wait is a hard 30 s and bring-up skew
    # (dataset scans, compiles) can exceed it on heterogeneous hosts
    from segan_pytorch_tpu.parallel import distributed_barrier
    distributed_barrier("train_start")

    segan.train(cfg, dloader, None, cfg.l1_weight, cfg.l1_dec_step, cfg.l1_dec_epoch,
                cfg.save_freq, va_dloader=va_dloader)

    # synchronized distributed shutdown while all processes are in lockstep —
    # the implicit atexit barrier's 30 s deadline can miss a straggler's
    # interpreter teardown and kill an otherwise-successful multi-host job
    from segan_pytorch_tpu.parallel import shutdown_distributed
    shutdown_distributed()


if __name__ == '__main__':
    from segan_pytorch_tpu.utils.config import SEGANConfig, dump_train_opts

    opts = build_parser().parse_args()
    d = vars(opts)
    cfg = SEGANConfig.from_dict(d)
    cfg.bias = not cfg.no_bias  # derived flag (ref train.py:248)
    # record the RESOLVED lowering knobs (env > cfg > default) so the dumped
    # train.opts reproduces the exact lowering set on reload (ops/knobs.py);
    # deconv_impl stays None here when it is an ENGINE default — main() re-dumps
    # the engine's resolved config after construction
    from segan_pytorch_tpu.ops import knobs
    for _k, _v in knobs.effective(cfg).items():
        setattr(cfg, _k, _v)
    dump_train_opts(cfg)
    print('Parsed arguments: ', cfg.to_json())
    main(cfg)

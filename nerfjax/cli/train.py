"""CLI: train the NeRF (reference: scripts/train.py and its fp32 twin
scripts/train_no_amp.py).

--fp32 reproduces the no-AMP ablation: fp32 compute, dist_last=1e6,
grad-clip 1.0 (reference deltas: train_no_amp.py:84,313-316).
"""

from nerfjax.cli._common import cfg_parser, load_cfg
from nerfjax.parallel import init_distributed
from nerfjax.train import train


def main() -> None:
    p = cfg_parser("Train NeRF / Instant-NGP on precomputed rays")
    p.add_argument("--fp32", action="store_true", help="fp32 twin (no-AMP ablation)")
    p.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile_dir", type=str, default=None)
    args = p.parse_args()
    # Multi-host pods: no-op unless NERFJAX_COORDINATOR/NERFJAX_NUM_PROCESSES
    # /NERFJAX_PROCESS_ID (or NERFJAX_DISTRIBUTED=1 for auto-detection) are
    # set, in which case the same CLI trains over the global pod mesh.
    init_distributed()
    cfg = load_cfg(args)
    if args.fp32:
        cfg = cfg.merge({"precision": "fp32", "dist_last": 1e6, "grad_clip": 1.0})
    train(cfg, seed=args.seed, resume=args.resume, profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()

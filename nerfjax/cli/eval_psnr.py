"""CLI: held-out-view PSNR of a trained checkpoint.

New capability vs the reference (whose only quality signal is train-batch
PSNR): renders frames of the transforms JSON with the trained fine model and
reports per-frame + mean PSNR.

  python -m nerfjax.cli.eval_psnr --cfg_path cfg/scene.yml [--frames N]
"""

from nerfjax.cli._common import cfg_parser, load_cfg


def main() -> None:
    p = cfg_parser("Evaluate held-out PSNR of a trained checkpoint")
    p.add_argument("--frames", type=int, default=None, help="limit to first N frames")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="override cfg.checkpoint")
    args = p.parse_args()
    cfg = load_cfg(args)

    from nerfjax import checkpoint as ckpt
    from nerfjax.render_image import eval_psnr
    from nerfjax.train import build_fields

    ckpt_path = args.checkpoint or cfg.checkpoint
    params = ckpt.load_field_params(ckpt_path, cfg, which="fine")
    fine = params["model"] if "model" in params else params["fine"]
    _, field, _ = build_fields(cfg)

    eval_psnr(
        field,
        fine,
        cfg.transforms_json,
        n_frames=args.frames,
        n_samples=int(cfg.get("N_samples", 64)),
        n_importance=int(cfg.get("N_importance", 128)),
        white_bg=bool(cfg.get("white_bg", False)),
    )


if __name__ == "__main__":
    main()

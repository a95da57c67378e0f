"""Observability: TensorBoard-compatible scalar logging + stdout summaries.

The reference logs Loss/Coarse, Loss/Fine, Loss/Total, PSNR and the LR to
TensorBoard every 100 steps (reference: scripts/train.py:325-338). We write
the same scalar names through tensorboardX (events files readable by the
same TensorBoard UI) and degrade to stdout-only if it's unavailable.
"""

from __future__ import annotations

from pathlib import Path


class Logger:
    def __init__(self, logdir: str | Path):
        self._writer = None
        try:
            from tensorboardX import SummaryWriter

            Path(logdir).mkdir(parents=True, exist_ok=True)
            self._writer = SummaryWriter(str(logdir))
        except Exception as e:  # pragma: no cover - env without tensorboardX
            print(f"[logging] TensorBoard writer unavailable ({e}); stdout only")

    def scalars(self, step: int, values: dict[str, float]) -> None:
        if self._writer is not None:
            for name, v in values.items():
                self._writer.add_scalar(name, v, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()

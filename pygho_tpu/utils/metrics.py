"""Structured metrics: jsonl event log + the reference's per-epoch print
format (example/zinc.py:425-427) for comparability."""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """Append-only jsonl metrics with the reference's stdout line format.

    Each ``log_epoch`` emits both a machine-readable record and the
    human-readable line matching the reference prints
    (trn time / val time / memory / l1loss / val MAE / tst MAE).
    """

    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")
        self.t0 = time.time()

    def log(self, record: Dict[str, Any]):
        record = {"t": round(time.time() - self.t0, 3), **record}
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()

    def log_epoch(self, epoch: int, trn_time: float, val_time: float,
                  mem_gb: float, trn_loss: float, val_mae: float,
                  tst_mae: float, lr: Optional[float] = None):
        self.log({"type": "epoch", "epoch": epoch, "trn_time": trn_time,
                  "val_time": val_time, "mem_gb": mem_gb,
                  "trn_loss": trn_loss, "val_mae": val_mae,
                  "tst_mae": tst_mae, "lr": lr})
        if self.echo:
            print(f"epoch {epoch} trn time {trn_time:.2f} "
                  f"val time {val_time:.2f} memory {mem_gb:.2f} GB  "
                  f"l1loss {trn_loss:.4f} val MAE {val_mae:.4f} "
                  f"tst MAE {tst_mae:.4f}", flush=True)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None


class CompileCounter:
    """Counts XLA backend compiles via jax.monitoring duration events —
    the recompile telemetry the bucketed-padding design promises
    (SURVEY.md §7.2 hard part #1: a handful of compiles in epoch 1,
    then none).  ``counter.delta()`` returns compiles since the last
    call; pair it with :class:`..hodata.loader.Buckets` growth events
    to attribute late recompiles to bucket growth."""

    _EVENT = "/jax/core/compile/backend_compile_duration"

    def __init__(self):
        self.count = 0
        self.total_secs = 0.0
        self._last = 0
        from jax import monitoring

        def _listener(name, secs, **kw):
            if name == self._EVENT:
                self.count += 1
                self.total_secs += secs

        monitoring.register_event_duration_secs_listener(_listener)

    def delta(self) -> int:
        d = self.count - self._last
        self._last = self.count
        return d

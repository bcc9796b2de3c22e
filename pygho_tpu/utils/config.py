"""Typed experiment configuration.

Maps 1:1 to the reference's argparse surface (example/zinc.py:31-53):
backend choice, conv type, aggregation, pooling, MLP shape/norm/dropout,
LR schedule (cosine restarts with K/K2 amplitude decay), batch size,
epochs, repeats — as dataclasses instead of flags, with (de)serialization
for reproducibility."""

from __future__ import annotations

import dataclasses
import json
from typing import Literal, Optional


@dataclasses.dataclass
class ModelConfig:
    conv: Literal["NGNN", "NGAT", "GNNAK", "DSSGNN", "SSWL", "SUN",
                  "PPGN", "I2GNN"] = "NGNN"
    sparse: bool = True               # --sparse: SS vs DD mode
    num_tasks: int = 1
    num_layer: int = 6
    hiddim: int = 128
    aggr: Literal["sum", "mean", "max"] = "sum"
    npool: Literal["sum", "mean", "max"] = "sum"
    lpool: Literal["sum", "mean", "max"] = "mean"
    cpool: Literal["sum", "mean", "max"] = "mean"
    mlplayer: int = 1
    outlayer: int = 2
    norm: Literal["bn", "ln", "none"] = "bn"
    act: str = "silu"
    dp: float = 0.0
    normparam: float = 0.1
    residual: bool = True

    def mlp_dict(self) -> dict:
        return {"numlayer": self.mlplayer, "tailact": True,
                "norm": self.norm, "act": self.act, "dp": self.dp,
                "normparam": self.normparam}


@dataclasses.dataclass
class TrainConfig:
    lr: float = 1e-3
    minlr: float = 0.0
    wd: float = 0.0
    bs: int = 128
    epochs: int = 100
    cosT: int = 100                    # restart period (epochs)
    K: float = 0.0                     # restart amplitude decay
    K2: float = 0.0
    repeat: int = 1
    seed: int = 0
    hop: int = 2


@dataclasses.dataclass
class ExperimentConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    dataset: str = "synthetic_zinc"
    out_dir: str = "runs"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "ExperimentConfig":
        d = json.loads(s)
        return cls(model=ModelConfig(**d["model"]),
                   train=TrainConfig(**d["train"]),
                   dataset=d.get("dataset", "synthetic_zinc"),
                   out_dir=d.get("out_dir", "runs"))

"""Model assembly: flagship HOGNN models for graph regression /
classification (reference example/minimal.py + example/zinc.py models)."""

from .zinc import (InputEncoderSp, InputEncoderMa, InputEncoderI2,
                   SpModel, MaModel, make_sp_model, make_ma_model,
                   make_model_from_config)
from . import training
from .serve import (SpPredictor, MaPredictor, export_forward,
                    load_exported, ExportedForward)

__all__ = [
    "InputEncoderSp", "InputEncoderMa", "InputEncoderI2",
    "SpModel", "MaModel", "make_sp_model", "make_ma_model",
    "make_model_from_config", "training",
    "SpPredictor", "MaPredictor", "export_forward", "load_exported",
    "ExportedForward",
]

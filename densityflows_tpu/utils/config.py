"""Configuration dataclasses with the reference's defaults.

The reference has no config subsystem — configuration is Julia keyword
defaults scattered across constructors (SURVEY.md §5 "Config / flag
system"). These dataclasses centralize the same defaults:

- network shape: hidden 32, 2 sublayers, relu, bias on
  (/root/reference/src/Layers.jl:113-123);
- data split: f_training 0.9, f_validation 0.1
  (/root/reference/src/Data.jl:156-162);
- training: epochs 100, batch 64, shuffle on, Adam 1e-3
  (/root/reference/src/Flows.jl:380-389; test/runtests.jl:114).
"""

from __future__ import annotations

import dataclasses

__all__ = ["NetConfig", "DataConfig", "TrainConfig", "FlowConfig"]


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """Conditioner-MLP shape (reference src/Layers.jl:113-123)."""

    hidden_dim_s: int = 32
    hidden_dim_t: int = 32
    n_sublayers_s: int = 2
    n_sublayers_t: int = 2
    activation_s: str = "relu"
    activation_t: str = "relu"
    bias: bool = True

    def layer_kwargs(self) -> dict:
        return dataclasses.asdict(self)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Split fractions (reference src/Data.jl:156-162)."""

    f_training: float = 0.9
    f_validation: float = 0.1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference src/Flows.jl:380-389)."""

    epochs: int = 100
    batchsize: int = 64
    shuffle: bool = True
    verbose: bool = True
    learning_rate: float = 1e-3


@dataclasses.dataclass(frozen=True)
class FlowConfig:
    """End-to-end experiment config: model + data + training."""

    net: NetConfig = NetConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    n_blocks: int = 3
    norm_alpha: float = -1.0
    norm_beta: float = 1.0

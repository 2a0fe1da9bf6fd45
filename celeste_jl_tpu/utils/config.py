"""Global inference configuration (config.jl:2-25 equivalent)."""

from dataclasses import dataclass


@dataclass
class Config:
    # patches must be at least this many pixels in radius
    min_radius_pix: float = 8.0
    # number of temperatures in the annealed importance sampling ladder
    num_ais_temperatures: int = 50
    # number of AIS importance samples
    num_ais_samples: int = 10
    # outer iterations of joint (Cyclades) variational inference
    num_joint_vi_iters: int = 3

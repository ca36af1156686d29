"""Fitting engines: SMPLify scan-loop, texture, sequences, checkpointing."""

from bodyfitting_tpu.fitting.smplify import (  # noqa: F401
    FitConfig,
    FitParams,
    Observations,
    fit,
    fit_loss,
)
from bodyfitting_tpu.fitting.texture import (  # noqa: F401
    TextureFitConfig,
    fit_texture,
)

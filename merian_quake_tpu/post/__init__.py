"""Post-processing stages: accumulate, exposure, tonemap, fxaa, add.

Equivalents of the merian built-in nodes wired in
res/default_config.json:402-727 (Accumulate, AutoExposure, Tonemap,
FXAA, Add) as pure image→image functions.
"""
from .accumulate import accumulate  # noqa: F401
from .exposure import auto_exposure  # noqa: F401
from .tonemap import tonemap_reinhard_extended  # noqa: F401

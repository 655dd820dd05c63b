"""Compatibility shim: the QuakeC assembler is a framework component now
(merian_quake_tpu/game/qcasm.py) so packaged mods and the CLI demo can
build progs images; tests import it from here unchanged."""
from merian_quake_tpu.game.qcasm import *  # noqa: F401,F403

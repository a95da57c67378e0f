"""GUI front-ends.

Rebuilds the reference's three GUI tools (final_gui.py, run_gui.py,
open3d_gui.py) on tkinter + matplotlib — the toolkits available in this
environment (the reference's PySide6/VisPy/Open3D are not) — with the same
three capabilities: config creation, pipeline launching, volume viewing.
All non-widget logic lives in nerfjax.gui.logic and is unit-tested.
"""

"""Pallas TPU kernels — the native kernel layer (SURVEY.md §7 layer 5).

Pallas/Mosaic is the TPU analog of the reference's GLSL kernel layer
(src/shaders/*.frag): hand-scheduled on-chip programs for the hot loops that
XLA's autofusion can't shape well. The semantics anchors remain
render/renderer.py (oracle-validated) and render/fast.py (the XLA production
path); every kernel here is validated against them.
"""

from . import support  # noqa: F401

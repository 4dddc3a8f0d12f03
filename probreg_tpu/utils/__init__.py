from . import dualquat, interop, io, math_utils, se3_op  # noqa: F401

from . import math, records, rng, spectrum, warp  # noqa: F401

from . import vecmath, rng, sobol, distribution, spectrum  # noqa: F401

from .columns import normalize_surface_col, strip_core_col, shingles_col  # noqa: F401

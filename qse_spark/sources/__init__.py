from .ntriples import read_ntriples  # noqa: F401
from .tables import read_table, write_table  # noqa: F401
from .turtle import read_turtle  # noqa: F401

"""PySpark-native openEO-style datacube engine (see SURVEY.md)."""

from .core.cube import Cube, CubeSchema, GridSpec  # noqa: F401
from .session import get_spark  # noqa: F401

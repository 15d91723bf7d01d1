"""Data-plane operators.

Each module registers named queries into :mod:`olympia_spark.operators.registry`
— the single source the driver contract (``__spark_entry__``), the pytest
oracle suite, and ``bench.py`` all read from.
"""

from olympia_spark.operators import registry  # noqa: F401


def load_all_modules() -> None:
    """Import every operator module so decorators register their queries."""
    from olympia_spark.operators import (  # noqa: F401
        relational,
        dedup,
        similarity,
        textops,
        multimodal,
        dml_queries,
        sources,
        streaming,
        udfs,
    )

"""Import every query-pack module so the registry is fully populated.

Import this module (for side effects) before reading
``plans.QUERIES`` / ``plans.ORACLES``.
"""

from . import reference_queries  # noqa: F401

_PACKS = ["reference_queries"]

try:  # packs are added incrementally; tolerate absence mid-build
    from . import relational_queries  # noqa: F401

    _PACKS.append("relational_queries")
except ImportError:
    pass

try:
    from . import llm_data_queries  # noqa: F401

    _PACKS.append("llm_data_queries")
except ImportError:
    pass

try:
    from . import streaming_queries  # noqa: F401

    _PACKS.append("streaming_queries")
except ImportError:
    pass

try:
    from . import source_queries  # noqa: F401

    _PACKS.append("source_queries")
except ImportError:
    pass

try:
    from . import scale_queries  # noqa: F401

    _PACKS.append("scale_queries")
except ImportError:
    pass

try:
    from . import tpch_queries  # noqa: F401

    _PACKS.append("tpch_queries")
except ImportError:
    pass

try:
    from . import udf_queries  # noqa: F401

    _PACKS.append("udf_queries")
except ImportError:
    pass

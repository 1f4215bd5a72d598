"""Processor registry — importing this package registers every
processor under its Beats config name (libbeat/processors/registry.go
is the reference mechanism; here registration is a class decorator)."""

from beats_spark.operators.base import (  # noqa: F401
    FLAGS_COL,
    ERROR_COL,
    Processor,
    ProcessorConfigError,
    Updates,
    REGISTRY,
    build_chain,
    make_processor,
    register,
)

# import for registration side effects
from beats_spark.operators import conditionals as _conditionals  # noqa: F401
from beats_spark.operators import enrich as _enrich  # noqa: F401
from beats_spark.operators import flowctl as _flowctl  # noqa: F401
from beats_spark.operators import netsec as _netsec  # noqa: F401
from beats_spark.operators import compat as _compat  # noqa: F401
from beats_spark.operators import mutate as _mutate  # noqa: F401
from beats_spark.operators import parse as _parse  # noqa: F401
from beats_spark.operators import redact as _redact  # noqa: F401
from beats_spark.operators import urlnorm as _urlnorm  # noqa: F401
from beats_spark.operators import html as _html  # noqa: F401

from beats_spark.functions.conditions import compile_condition  # noqa: F401
from beats_spark.functions.fmtstr import compile_fmtstr  # noqa: F401
from beats_spark.functions.dissect import DissectPattern  # noqa: F401

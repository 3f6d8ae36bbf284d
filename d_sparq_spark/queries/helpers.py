"""Back-compat re-export; the helpers live in functions/numeric.py (the
queries package imports ALL query modules at init, so anything imported
from outside the package must not live inside it — circular import)."""

from d_sparq_spark.functions.numeric import DEC, davg, dsum, sql_davg, sql_dsum  # noqa: F401

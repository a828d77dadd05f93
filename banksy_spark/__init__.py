"""banksy_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the dataflow capabilities of
the reference repo ``dan-verheul/banksy`` (a pandas sports-betting
arbitrage scanner), extended with the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing).

Design rules (see SURVEY.md §4, §7):
 - DataFrame/SQL API only; Catalyst plans everything. No RDDs.
 - Zero row-at-a-time Python UDFs in the core operator set; Arrow
   ``pandas_udf`` / ``applyInPandas`` only where expression trees
   genuinely can't express the semantics.
 - Row order is never implicit: every order-dependent operator takes an
   explicit ordering column set (the ``_seq`` contract, SURVEY.md §4.3).
 - Coercing casts are ``try_cast`` (pandas ``to_numeric(errors='coerce')``
   parity); ANSI mode is off in the session factory.
"""

from banksy_spark.session import get_spark
from banksy_spark.io import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]
__version__ = "0.1.0"

"""shippai_knowledge_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference `daikumatan/shippai-knowledge-etl`
(read-only at /root/reference), extended with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
that a 100 TB training-data pipeline needs.

Design rules (SURVEY.md §7.0):
  1. Expression-first: operators are built-in Column expressions so
     Catalyst optimizes (pushdown, pruning, codegen) everything.
  2. UDFs only at edges (HTTP fetch, HTML parse, PDF render), Arrow form.
  3. Errors are data: status columns + try_* functions, never exceptions.
  4. Order is explicit: position columns, never implicit row order.
"""

__version__ = "0.1.0"

"""ariadne_dbt_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference engine
``bruno-ribeirodasilva/ariadne-dbt`` (a dbt-metadata analytics engine:
hybrid BM25+centrality search, DAG lineage, pattern mining, token-budgeted
context capsules, plus a managed-SQL execution surface), re-expressed as
idiomatic Spark DataFrame / SQL programs, and extended with the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) the 100 TB north star needs.

Nothing here is a translation of the reference's code; citations of the
form ``reference: <file>:<line>`` in docstrings point at the *behavior*
being reproduced (see SURVEY.md for the full inventory).
"""

__version__ = "0.3.0"

"""deepie_spark — a PySpark-native knowledge-graph construction engine.

A brand-new, Spark-first re-creation of the capabilities of the reference
relation-extraction system anoperson/DeepIE (`/root/reference`): TSV corpus
parsing, dictionary/vocabulary building, feature encoding, batched neural
inference, P/R scoring, and triple emission — re-expressed as DataFrame/SQL
plans plus Arrow-vectorized pandas UDFs, and extended with the operators a
web-scale (Common-Crawl-style) training-data pipeline needs: text
extraction, mention detection, deduplication, similarity search, text
quality analysis, connected-components canonicalization, and
checkpoint/resume.

Nothing here is a port: the reference is a single-process Python2/Theano
program; this package expresses the same semantics as distributed Spark
plans (see SURVEY.md for the operator-by-operator mapping).
"""

__version__ = "0.1.0"

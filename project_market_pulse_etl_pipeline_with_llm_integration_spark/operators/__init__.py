# Operator library; import submodules directly, e.g.
#   from ..._spark.operators import clean, ids, relational, dedup

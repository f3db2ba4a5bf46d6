from assemblagedb_spark.functions.core import (  # noqa: F401
    gram_term_sql,
    spark_grams_array_expr,
    index_text,
    trim_for_search,
    xor_id_expr,
    MINHASH_PRIME,
    minhash_coeffs,
)



def test_chunk_udtf_agrees_with_relational_twin(spark, sf_dir):
    """The imperative UDTF chunker and the codegen explode+slice
    chunker must be row-identical — same tokens, same windows, same
    short last chunk."""
    from etl_orders_spark.plans.registry import query_map

    q = query_map()
    a = sorted(map(tuple, q["chunk_docs_windows"](spark, sf_dir).collect()))
    b = sorted(map(tuple, q["chunk_docs_udtf"](spark, sf_dir).collect()))
    assert a == b and len(a) > 0

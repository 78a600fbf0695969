from re_data_pipeline_spark.llm.harness import (
    MockEmbeddingClient,
    MockLLMClient,
    embed_column,
    llm_map,
)

__all__ = ["MockLLMClient", "MockEmbeddingClient", "llm_map", "embed_column"]

from .graph_load import GraphLoadPipeline, GraphLoadReport

__all__ = ["GraphLoadPipeline", "GraphLoadReport"]

from .graph import project_nodes, project_edges, route_sources
from .edge_resolution import resolve_edges, dangling_edges

__all__ = [
    "project_nodes",
    "project_edges",
    "route_sources",
    "resolve_edges",
    "dangling_edges",
]

from .compiler import ExpressionCompiler, compile_expression, referenced_columns
from .projection import parse_projection, ProjectionColumn

__all__ = [
    "ExpressionCompiler",
    "compile_expression",
    "referenced_columns",
    "parse_projection",
    "ProjectionColumn",
]

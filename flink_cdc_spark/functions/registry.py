"""User-defined-function registry.

Spark rendition of the reference's UDF surface
(common/udf/UserDefinedFunction.java: eval() + getReturnType() +
open()/close() lifecycle; YAML `pipeline.user-defined-function:` parsed by
cli/parser/YamlPipelineDefinitionParser.java): a UDF is a Python callable
addressed by "pkg.module:attr", registered into the SparkSession under its
YAML name so transform expressions can call it.

Return-type resolution order:
  1. a `result_type` attribute on the callable (CDC type string or a
     pyspark DataType) — the getReturnType() analog;
  2. an explicit `result-type` option in the YAML block;
  3. default STRING.

Lifecycle: if the target is a class, it is instantiated once per
registration; `open()` is called before first use and `close()` is
best-effort at interpreter exit (executor-side state should live in the
callable itself — Spark pickles it per task, matching the reference's
per-subtask instances).
"""

from __future__ import annotations

import atexit
import importlib
from typing import Callable, Iterable, Optional

from pyspark.sql import SparkSession, types as T

from ..core.types import parse_type, to_spark_type
from ..pipeline.definition import UdfDef


def _resolve_callable(classpath: str):
    if ":" in classpath:
        mod_name, attr = classpath.split(":", 1)
    else:
        mod_name, attr = classpath.rsplit(".", 1)
    mod = importlib.import_module(mod_name)
    target = getattr(mod, attr)
    if isinstance(target, type):  # class with eval(), reference-style
        instance = target()
        if hasattr(instance, "open"):
            instance.open()
        if hasattr(instance, "close"):
            atexit.register(instance.close)
        fn = instance.eval if hasattr(instance, "eval") else instance
        if not hasattr(fn, "result_type") and hasattr(instance, "result_type"):
            return instance, fn
        return instance, fn
    return None, target


def _spark_return_type(fn, udf_def: Optional[UdfDef], holder=None) -> T.DataType:
    rt = getattr(fn, "result_type", None)
    if rt is None and holder is not None:
        rt = getattr(holder, "result_type", None)
    if rt is None and udf_def is not None:
        rt = udf_def.options.get("result-type")
    if rt is None:
        return T.StringType()
    if isinstance(rt, T.DataType):
        return rt
    return to_spark_type(parse_type(str(rt)))


def _vectorize(fn: Callable, rt: T.DataType):
    """Wrap a scalar eval() in an Arrow-batched pandas UDF: the per-row
    Python call stays (the reference's eval contract), but rows move
    between the JVM and Python in Arrow record batches instead of pickled
    one at a time — the 10-100x serialization win on the UDF hot path.
    Falls back to a plain row UDF if pandas/pyarrow are unavailable."""
    try:
        import pandas as pd
        from pyspark.sql.functions import PandasUDFType, pandas_udf
    except ImportError:  # pragma: no cover - both are baked into the image
        return None

    import inspect

    try:
        if not inspect.signature(fn).parameters:
            # a scalar pandas UDF must return a Series matching the Arrow
            # batch length; a 0-arg fn has no batch to size against, so it
            # takes the plain row-UDF path instead
            return None
    except (TypeError, ValueError):  # builtins without signatures
        pass

    def batched(*cols):
        # numeric NULLs arrive as NaN under pandas dtypes — eval() expects
        # None (the reference passes nulls through as null)
        plain = [c.astype(object).where(pd.notna(c), None) for c in cols]
        return pd.Series(
            [fn(*vals) for vals in zip(*plain)], dtype=object
        )

    # explicit SCALAR functionType: the wrapper has no type hints to infer
    # from (fn's own signature is scalar, not Series)
    return pandas_udf(batched, rt, PandasUDFType.SCALAR)


class UdfRegistry:
    """Registers pipeline UDFs into a SparkSession and tracks their names
    (the expression compiler treats known UDF names as opaque calls)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.names: set = set()

    def _register(self, name: str, fn: Callable, rt: T.DataType) -> None:
        vec = _vectorize(fn, rt)
        if vec is not None:
            self.spark.udf.register(name.lower(), vec)
        else:
            self.spark.udf.register(name.lower(), fn, rt)
        self.names.add(name.upper())

    def register(self, name: str, fn: Callable, return_type=None) -> None:
        rt = return_type
        if rt is None:
            rt = _spark_return_type(fn, None)
        elif isinstance(rt, str):
            rt = to_spark_type(parse_type(rt))
        self._register(name, fn, rt)

    def register_def(self, udf_def: UdfDef) -> None:
        holder, fn = _resolve_callable(udf_def.classpath)
        rt = _spark_return_type(fn, udf_def, holder)
        self._register(udf_def.name, fn, rt)

    def udf_names(self) -> frozenset:
        return frozenset(self.names)


def register_pipeline_udfs(spark: SparkSession, udf_defs: Iterable[UdfDef]) -> frozenset:
    reg = UdfRegistry(spark)
    for d in udf_defs:
        reg.register_def(d)
    return reg.udf_names()

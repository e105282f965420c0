"""AI/model functions: GET_EMBEDDING, AI_CHAT_PREDICT, AI_LANGCHAIN_PREDICT.

Spark rendition of the reference's model UDFs
(flink-cdc-pipeline-model/.../OpenAIEmbeddingModel.java:47,
OpenAIChatModel.java; registered from the YAML `model:` block,
composer/definition/ModelDef.java). Implemented as Arrow-batched pandas
UDFs so each executor batches many rows per model call — the only sane
shape at 100 TB (row-at-a-time model RPCs would be the bottleneck).

Backends:
  * an OpenAI-compatible HTTP endpoint when the ModelDef provides
    `host`/`apiKey` AND the client library is importable;
  * otherwise a DETERMINISTIC OFFLINE STUB (clearly marked): embeddings
    are md5-seeded unit vectors, chat replies echo a digest. The stub
    keeps the Spark-side plumbing (batching, schema, registration) fully
    testable in environments without network or the client package.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import SparkSession, types as T
from pyspark.sql.functions import pandas_udf

from ..pipeline.definition import ModelDef

STUB_EMBED_DIM = 16


def _stub_embedding(text: str) -> list:
    """Deterministic pseudo-embedding: md5-derived, L2-normalized."""
    if text is None:
        return None
    h = hashlib.md5(text.encode("utf-8")).digest()
    vals = [(b - 127.5) / 127.5 for b in h[:STUB_EMBED_DIM]]
    norm = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [float(v / norm) for v in vals]


def _stub_chat(prompt: str) -> Optional[str]:
    if prompt is None:
        return None
    return f"[stub:{hashlib.md5(prompt.encode('utf-8')).hexdigest()[:12]}]"


def _openai_client(model_def: ModelDef):
    """Returns a client or None. Import-gated: the `openai` package is not
    a dependency; absence (or no host/key) selects the offline stub."""
    host = model_def.options.get("host")
    api_key = model_def.options.get("apiKey") or model_def.options.get("api-key")
    if not host or not api_key:
        return None
    try:
        import openai  # noqa: F401

        return openai.OpenAI(base_url=host, api_key=api_key)
    except Exception:
        return None


def make_get_embedding(model_def: ModelDef):
    """Builds the GET_EMBEDDING pandas UDF for a model definition."""
    model_name = model_def.options.get("model-name") or model_def.model_name
    client_factory = _openai_client

    @pandas_udf(T.ArrayType(T.FloatType()))
    def get_embedding(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        client = client_factory(model_def)
        for texts in batches:
            if client is None:
                yield texts.map(_stub_embedding)
            else:
                resp = client.embeddings.create(
                    model=model_name, input=texts.fillna("").tolist()
                )
                yield pd.Series([d.embedding for d in resp.data])

    return get_embedding


def make_chat_predict(model_def: ModelDef):
    model_name = model_def.options.get("model-name") or model_def.model_name
    client_factory = _openai_client

    @pandas_udf(T.StringType())
    def ai_chat_predict(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        client = client_factory(model_def)
        for prompts in batches:
            if client is None:
                yield prompts.map(_stub_chat)
            else:
                outs = []
                for p in prompts.tolist():
                    r = client.chat.completions.create(
                        model=model_name,
                        messages=[{"role": "user", "content": p or ""}],
                    )
                    outs.append(r.choices[0].message.content)
                yield pd.Series(outs)

    return ai_chat_predict


def make_langchain_predict(model_def: ModelDef):
    """AI_LANGCHAIN_PREDICT (TransformSqlOperatorTable.java:677-687 —
    same (STRING, STRING, STRING) -> VARCHAR surface as AI_CHAT_PREDICT,
    routed through langchain4j in the reference / the `langchain` package
    here). Import-gated like the OpenAI client; the offline stub tags its
    digest so tests can tell the three functions apart."""
    model_name = model_def.options.get("model-name") or model_def.model_name

    def _client(md):
        host = md.options.get("host")
        api_key = md.options.get("apiKey") or md.options.get("api-key")
        if not host or not api_key:
            return None
        try:
            from langchain_openai import ChatOpenAI

            return ChatOpenAI(model=model_name, base_url=host, api_key=api_key)
        except Exception:
            return None

    @pandas_udf(T.StringType())
    def ai_langchain_predict(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        client = _client(model_def)
        for prompts in batches:
            if client is None:
                yield prompts.map(
                    lambda p: None
                    if p is None
                    else f"[langchain-stub:{hashlib.md5(p.encode('utf-8')).hexdigest()[:12]}]"
                )
            else:
                yield pd.Series([client.invoke(p or "").content for p in prompts.tolist()])

    return ai_langchain_predict


def register_models(spark: SparkSession, model_defs) -> frozenset:
    """Register GET_EMBEDDING / AI_CHAT_PREDICT / AI_LANGCHAIN_PREDICT
    under each model's name prefix; returns UDF names for the expression
    compiler."""
    names = set()
    for md in model_defs:
        cls = (md.class_name or "").rsplit(".", 1)[-1]
        if "Embedding" in cls:
            spark.udf.register(f"{md.model_name.lower()}_get_embedding", make_get_embedding(md))
            names.add(f"{md.model_name.upper()}_GET_EMBEDDING")
        elif "LangChain" in cls or "Langchain" in cls:
            spark.udf.register(
                f"{md.model_name.lower()}_langchain_predict", make_langchain_predict(md)
            )
            names.add(f"{md.model_name.upper()}_LANGCHAIN_PREDICT")
        else:
            spark.udf.register(f"{md.model_name.lower()}_chat_predict", make_chat_predict(md))
            names.add(f"{md.model_name.upper()}_CHAT_PREDICT")
    return frozenset(names)

"""Structured ``response_format`` outputs → typed Spark columns.

Reference behavior being matched (Spark-first, per SURVEY §1.2):

- ``lotus/sem_ops/sem_agg.py:471-484`` — a pydantic model / JSON-schema
  ``response_format`` is forwarded to the LM call and, with
  ``split_fields_into_cols``, the returned JSON's fields become
  DataFrame COLUMNS (``model_validate_json(...).model_dump()`` →
  ``pd.DataFrame([output])``).
- ``lotus/evals/llm_as_judge.py:16-115`` — the judge accepts a
  ``response_format`` (structured scores), forwards it per trial, and
  rejects CoT strategies ("use a reasoning field in the response format
  instead", ``:92-95``).

Spark design: the LM's raw JSON answer stays a string column inside the
Arrow-batched map; the field split is ``F.from_json(answer, schema)``
→ one typed column per schema field — a pure Catalyst expression, no
Python re-parse, no second LM pass, and malformed JSON degrades to NULL
fields (PERMISSIVE mode) exactly like the reference's warn-and-continue
``json.JSONDecodeError`` branch. Accepted ``response_format`` spellings:

- a Spark ``StructType`` or a DDL string (``"score int, verdict string"``)
  — the native spelling;
- a pydantic ``BaseModel`` subclass (the reference's spelling) — field
  annotations map to Spark types, and the CLASS is forwarded to the LM
  client verbatim (litellm accepts pydantic models);
- a JSON-schema ``dict`` (``{"type": "object", "properties": ...}``).

The LM client receives ``response_format=<json schema dict>`` (or the
pydantic class) as a per-call kwarg: LiteLLMClient passes it through to
``litellm.batch_completion``; FakeLMs ignore kwargs, so hermetic tests
pair this with a fake that emits JSON (``StructuredJSONLM``).
"""
from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_JSON_TO_SPARK: dict[str, DataType] = {
    "string": StringType(),
    "integer": LongType(),
    "number": DoubleType(),
    "boolean": BooleanType(),
}

_PY_TO_SPARK: dict[type, DataType] = {
    str: StringType(),
    int: LongType(),
    float: DoubleType(),
    bool: BooleanType(),
}


def _is_pydantic_model(obj: Any) -> bool:
    try:
        from pydantic import BaseModel
    except ImportError:  # pragma: no cover - env without pydantic
        return False
    return isinstance(obj, type) and issubclass(obj, BaseModel)


def _spark_type_of_annotation(ann: Any, where: str) -> DataType:
    import types
    import typing

    origin = typing.get_origin(ann)
    if origin in (list, tuple):
        args = typing.get_args(ann)
        inner = _spark_type_of_annotation(args[0] if args else str, where)
        return ArrayType(inner)
    # Optional[T] → T (Spark fields are nullable): both the
    # typing.Optional spelling and PEP 604's `T | None`
    # (types.UnionType — the common modern pydantic spelling)
    if origin is typing.Union or origin is types.UnionType:
        args = [a for a in typing.get_args(ann) if a is not type(None)]
        if len(args) == 1:
            return _spark_type_of_annotation(args[0], where)
        raise ValueError(f"{where}: unsupported Union annotation {ann!r}")
    if _is_pydantic_model(ann):  # nested model → nested struct
        return _schema_of_pydantic(ann)
    if ann in _PY_TO_SPARK:
        return _PY_TO_SPARK[ann]
    raise ValueError(
        f"{where}: unsupported field annotation {ann!r} — use "
        "str/int/float/bool, lists of those, or a nested model")


def _schema_of_pydantic(model: Any) -> StructType:
    fields = []
    for name, finfo in model.model_fields.items():
        dt = _spark_type_of_annotation(
            finfo.annotation, f"response_format field {name!r}")
        fields.append(StructField(name, dt))
    return StructType(fields)


def _schema_of_json_schema(js: dict) -> StructType:
    props = js.get("properties")
    if js.get("type") != "object" or not isinstance(props, dict):
        raise ValueError(
            "response_format dict must be a JSON schema with "
            '"type": "object" and a "properties" mapping')
    fields = []
    for name, spec in props.items():
        t = spec.get("type", "string")
        if t == "array":
            items = spec.get("items") or {}
            inner = items.get("type", "string")
            if inner == "object":
                dt: DataType = ArrayType(_schema_of_json_schema(items))
            elif inner in _JSON_TO_SPARK:
                dt = ArrayType(_JSON_TO_SPARK[inner])
            else:
                raise ValueError(
                    f"response_format array field {name!r} has "
                    f"unsupported items type {inner!r} — use "
                    "string/integer/number/boolean or object (silently "
                    "coercing to array<string> would corrupt values)")
        elif t == "object":
            dt = _schema_of_json_schema(spec)
        else:
            dt = _JSON_TO_SPARK.get(t, StringType())
        fields.append(StructField(name, dt))
    return StructType(fields)


def response_format_schema(response_format: Any) -> StructType:
    """The Spark ``StructType`` the LM's JSON answer is parsed into."""
    if isinstance(response_format, StructType):
        return response_format
    if isinstance(response_format, str):
        parsed = StructType.fromDDL(response_format)
        return parsed
    if _is_pydantic_model(response_format):
        return _schema_of_pydantic(response_format)
    if isinstance(response_format, dict):
        return _schema_of_json_schema(response_format)
    raise ValueError(
        "response_format must be a Spark StructType, a DDL string, a "
        f"pydantic model class, or a JSON-schema dict — got "
        f"{type(response_format).__name__}")


def _json_schema_of_spark(dt: DataType) -> dict:
    if isinstance(dt, StructType):
        return {
            "type": "object",
            "properties": {
                f.name: _json_schema_of_spark(f.dataType) for f in dt.fields
            },
            "required": [f.name for f in dt.fields],
            "additionalProperties": False,
        }
    if isinstance(dt, ArrayType):
        return {"type": "array",
                "items": _json_schema_of_spark(dt.elementType)}
    from pyspark.sql.types import BooleanType as _B
    from pyspark.sql.types import FractionalType, IntegralType

    if isinstance(dt, IntegralType):
        return {"type": "integer"}
    if isinstance(dt, FractionalType):
        return {"type": "number"}
    if isinstance(dt, _B):
        return {"type": "boolean"}
    return {"type": "string"}


def response_format_lm_kwarg(response_format: Any) -> Any:
    """What gets forwarded to the LM client as ``response_format=``:
    pydantic classes and dicts verbatim (litellm's accepted spellings);
    Spark spellings converted to an OpenAI-style json_schema wrapper."""
    if _is_pydantic_model(response_format) or isinstance(response_format,
                                                         dict):
        return response_format
    schema = response_format_schema(response_format)
    return {
        "type": "json_schema",
        "json_schema": {"name": "response",
                        "schema": _json_schema_of_spark(schema),
                        "strict": True},
    }


def strip_json_fences(col: Column) -> Column:
    """LMs often wrap JSON in markdown fences; strip them (and
    surrounding whitespace) before ``from_json`` — pure codegen
    expressions, applied once to the answer column."""
    c = F.trim(col)
    c = F.regexp_replace(c, r"^```[a-zA-Z]*\s*", "")
    c = F.regexp_replace(c, r"\s*```$", "")
    return F.trim(c)


def split_fields(df: DataFrame, answer_col: str, response_format: Any,
                 who: str, field_suffix: str = "") -> DataFrame:
    """Append one typed column per ``response_format`` field, parsed
    from the JSON string in ``answer_col`` (reference sem_agg's
    ``split_fields_into_cols``). Malformed JSON yields NULL fields;
    existing-column collisions raise (silently clobbering a source
    column would corrupt the frame). ``field_suffix`` disambiguates the
    output names (multi-trial judges: ``score_judge_0``, ...)."""
    schema = response_format_schema(response_format)
    names = {f.name: f"{f.name}{field_suffix}" for f in schema.fields}
    clash = [n for n in names.values() if n in df.columns]
    if clash:
        raise ValueError(
            f"{who}: response_format field(s) {clash} collide with "
            "existing DataFrame columns — rename the fields or the "
            "columns")
    parsed = F.from_json(strip_json_fences(F.col(answer_col)), schema)
    out = df
    for f in schema.fields:
        out = out.withColumn(names[f.name], parsed[f.name])
    return out

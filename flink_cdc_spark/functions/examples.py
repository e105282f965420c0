"""Shippable example UDFs — the analog of the reference's
flink-cdc-pipeline-udf-examples module (lifecycle-hooked classes and plain
functions a pipeline YAML can bind by classpath)."""

from __future__ import annotations


def format_money(v):
    """'$1234.50'-style rendering; NULL-propagating."""
    return f"${v:.2f}" if v is not None else None


format_money.result_type = "STRING"


class TierClassifier:
    """Reference-style UDF class: eval() plus open/close lifecycle hooks
    (UserDefinedFunctionDescriptor scope)."""

    result_type = "STRING"

    def __init__(self):
        self.opened = False

    def open(self):
        self.opened = True

    def close(self):
        pass

    def eval(self, bal):
        if bal is None:
            return None
        return "high" if bal > 5000 else "low"

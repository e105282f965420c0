"""Fixture UDFs for registry tests (the analog of
flink-cdc-pipeline-udf-examples/)."""


def format_money(v):
    return f"${v:,.2f}" if v is not None else None


format_money.result_type = "STRING"


class TierClassifier:
    """Reference-style UDF class: eval() + lifecycle hooks."""

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

"""Form-input selection + form-state algebra + submit synthesis.

Form state is a ``map<string, array<string>>`` column (the
reference's ``string list StringMap.t``, src/page.ml:132).  Every
operator below exists twice with identical semantics:

* a **Column** version (JVM-side; ``map_concat`` upsert relies on
  ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` set by
  :func:`mechaml_spark.session.get_spark`), used in distributed
  pipelines;
* a **pure-Python** version over plain dicts (suffix ``_py``), used
  by the sequential oracle crawler and the golden tests.

Reference quirks replicated on purpose (all cited):
  * ``Checkbox.check`` prepends unconditionally — checking twice
    duplicates the value (``add_value``, src/page.ml:331-333);
  * ``Checkbox.uncheck`` removes **all** occurrences and leaves an
    empty list under the key (``rem_value``, src/page.ml:335-338);
  * ``RadioButton.select`` replaces the group with a singleton
    (src/page.ml:448-454);
  * ``SelectList.unselect`` removes the **whole key**, ignoring the
    item argument (impl src/page.ml:490-495 beats its doc);
  * ``SelectList.select``: multiple -> prepend-if-absent, single ->
    replace (src/page.ml:515-526);
  * ``Form.get_multi`` raises on an absent key (src/page.ml:173);
  * submit body/query: ``Form.values`` yields keys in **descending**
    order (StringMap.fold cons, src/page.ml:185) and ocaml-uri
    comma-joins multiple values of one key.
"""

from __future__ import annotations

from urllib.parse import quote, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mechaml_spark.htmlkit.selector import tag_selector
from mechaml_spark.page import selector_column

# ----------------------------------------------------- input-family catalog

_SIMPLE_TYPES = (
    "checkbox radio text password hidden color date email month number "
    "tel search time url"
).split()

FIELD_TYPES = ("text", "password", "hidden")  # src/page.ml:38-42
NUMERIC_TYPES = ("range", "number")  # src/page.ml:44-47


def _family_spec(family: str) -> tuple[str, "callable"]:
    """(default_selector, post_filter(input_struct) -> Column) per
    reference family definitions (src/page.ml:202-306)."""
    if family in _SIMPLE_TYPES:
        return (
            f"input[type={family}]",
            lambda n: (n["tag"] == "input") & (n["itype"] == family),
        )
    if family == "select_list":
        return ("select", lambda n: n["tag"] == "select")
    if family == "textarea":
        return ("textarea", lambda n: n["tag"] == "textarea")
    if family == "field":
        return (
            "*",
            lambda n: (n["tag"] == "textarea")
            | ((n["tag"] == "input") & n["itype"].isin(*FIELD_TYPES)),
        )
    if family == "numeric":
        return (
            "input",
            lambda n: (n["tag"] == "input") & n["itype"].isin(*NUMERIC_TYPES),
        )
    raise ValueError(f"unknown input family {family!r}")


def input_predicate(family: str, selector: str, node: Column) -> Column:
    """Predicate over an ``input`` struct column: `tag_selector`
    normalization against the family default + the family post-filter
    (``input_filter``/``tag_filter``/``field_filter``/``numeric_filter``,
    src/page.ml:27-61)."""
    default_sel, post = _family_spec(family)
    css = tag_selector(default_sel, selector)
    return selector_column(css, node) & post(node)


def inputs_with(
    forms_df: DataFrame, family: str, selector: str = "",
    form_col: str = "node", keep: tuple[str, ...] = ("url",),
) -> DataFrame:
    """Explode a selected form's ``inputs``; filter per family+selector.
    ``forms_df`` is the output of :func:`mechaml_spark.page.forms_with`."""
    df = forms_df.select(
        *keep,
        F.col(form_col).alias("form"),
        F.explode(F.col(form_col)["inputs"]).alias("node"),
    )
    return df.where(input_predicate(family, selector, F.col("node")))


# ----------------------------------------------------- Column state algebra

_EMPTY_ARR = "CAST(array() AS array<string>)"


def _vals(state: Column, name: Column | str) -> Column:
    name = F.lit(name) if isinstance(name, str) else name
    return F.coalesce(F.element_at(state, name), F.expr(_EMPTY_ARR))


def _upsert(state: Column, name: Column | str, values: Column) -> Column:
    name = F.lit(name) if isinstance(name, str) else name
    return F.map_concat(state, F.map_from_arrays(F.array(name), F.array(values)))


def state_set(state: Column, name, value) -> Column:
    value = F.lit(value) if isinstance(value, str) else value
    return _upsert(state, name, F.array(value))


def state_set_multi(state: Column, name, values: list[str]) -> Column:
    return _upsert(state, name, F.array(*[F.lit(v) for v in values]))


def state_clear(state: Column, name) -> Column:
    name = F.lit(name) if isinstance(name, str) else name
    return F.map_filter(state, lambda k, _v: k != name)


def state_clear_all(state: Column) -> Column:
    return F.map_filter(state, lambda _k, _v: F.lit(False))


def state_get(state: Column, name) -> Column:
    """Head of the value list, or NULL (``Form.get``, src/page.ml:174-177)."""
    return F.get(_vals(state, name), 0)


def checkbox_check(state: Column, name, value) -> Column:
    value = F.lit(value) if isinstance(value, str) else value
    return _upsert(state, name, F.concat(F.array(value), _vals(state, name)))


def checkbox_uncheck(state: Column, name, value) -> Column:
    value = F.lit(value) if isinstance(value, str) else value
    return _upsert(state, name, F.array_remove(_vals(state, name), value))


def is_checked(state: Column, name, value) -> Column:
    value = F.lit(value) if isinstance(value, str) else value
    return F.array_contains(_vals(state, name), value)


def radio_select(state: Column, name, value) -> Column:
    return state_set(state, name, value)


def select_list_select(state: Column, name, value, multiple: Column) -> Column:
    value = F.lit(value) if isinstance(value, str) else value
    cur = _vals(state, name)
    multi_vals = F.when(
        F.array_contains(cur, value), cur
    ).otherwise(F.concat(F.array(value), cur))
    return _upsert(
        state, name, F.when(multiple, multi_vals).otherwise(F.array(value))
    )


def select_list_unselect(state: Column, name) -> Column:
    return state_clear(state, name)


def current_value(state: Column, name) -> Column:
    """Some v iff exactly a singleton (src/page.ml:340-344)."""
    vals = _vals(state, name)
    return F.when(F.size(vals) == 1, F.get(vals, 0))


# ------------------------------------------------------- Python state mirror


def state_set_py(state: dict, name: str, value: str) -> dict:
    s = dict(state)
    s[name] = [value]
    return s


def state_set_multi_py(state: dict, name: str, values: list[str]) -> dict:
    s = dict(state)
    s[name] = list(values)
    return s


def state_clear_py(state: dict, name: str) -> dict:
    s = dict(state)
    s.pop(name, None)
    return s


def state_get_py(state: dict, name: str):
    vals = state.get(name, [])
    return vals[0] if vals else None


def state_get_multi_py(state: dict, name: str) -> list[str]:
    """Raises KeyError on absent key (``Form.get_multi`` parity)."""
    return state[name]


def checkbox_check_py(state: dict, name: str, value: str) -> dict:
    s = dict(state)
    s[name] = [value] + s.get(name, [])
    return s


def checkbox_uncheck_py(state: dict, name: str, value: str) -> dict:
    s = dict(state)
    s[name] = [v for v in s.get(name, []) if v != value]
    return s


def is_checked_py(state: dict, name: str, value: str) -> bool:
    return value in state.get(name, [])


def radio_select_py(state: dict, name: str, value: str) -> dict:
    return state_set_py(state, name, value)


def select_list_select_py(state: dict, name: str, value: str, multiple: bool) -> dict:
    s = dict(state)
    if multiple:
        cur = s.get(name, [])
        s[name] = cur if value in cur else [value] + cur
    else:
        s[name] = [value]
    return s


def select_list_unselect_py(state: dict, name: str) -> dict:
    return state_clear_py(state, name)


def current_value_py(state: dict, name: str):
    vals = state.get(name, [])
    return vals[0] if len(vals) == 1 else None


# --------------------------------------------------------- submit synthesis


def encode_form_query(state: dict[str, list[str]]) -> str:
    """ocaml-uri ``encoded_of_query`` over ``Form.values``: keys in
    DESCENDING order (src/page.ml:185), one ``k=v1,v2`` pair per key
    (multi-values comma-joined), percent-encoded."""
    parts = []
    for name in sorted(state.keys(), reverse=True):
        vals = state[name]
        enc = ",".join(quote(v, safe="") for v in vals)
        parts.append(f"{quote(name, safe='')}={enc}")
    return "&".join(parts)


def synthesize_submit_py(
    action_uri: str, method: str, state: dict[str, list[str]]
) -> tuple[str, str, str | None]:
    """(method, url, body) for a form submission (src/agent.ml:119-130).

    POST -> body is the encoded query, url untouched.
    GET  -> query REPLACED (not merged) by the encoded state.
    """
    q = encode_form_query(state)
    if method == "POST":
        return ("POST", action_uri, q)
    scheme, netloc, path, _oldq, frag = urlsplit(action_uri)
    return ("GET", urlunsplit((scheme, netloc, path, q, frag)), None)


_SUBMIT_T = T.StructType(
    [
        T.StructField("method", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


@F.pandas_udf(_SUBMIT_T)
def synthesize_submit_udf(
    action_uri: pd.Series, method: pd.Series, state: pd.Series
) -> pd.DataFrame:
    rows = []
    for a, m, s in zip(action_uri, method, state):
        st = {k: list(v) for k, v in (s or {}).items()}
        mm, url, body = synthesize_submit_py(a or "", m or "GET", st)
        rows.append({"method": mm, "url": url, "body": body})
    return pd.DataFrame(rows, columns=["method", "url", "body"])

"""Bug-for-bug pandas oracle of the reference EP1 pipeline
(``reference/groups_creation.main``, SURVEY.md §3 EP1) for parity testing.

Faithful reproductions (file:line):
- remove_duplication_for_uuid: groupby-sum, sort [uuid, sold] desc, keep
  first per uuid (``reference/static.py:301-321``)
- clean_text: lower/strip, drop NaN, special-char regex (``static.py:24-30``)
- replace_stop_words WITH the whole-string bug (``static.py:32-34``)
- token re-join minus '.' + promo regex (``static.py:50-55``)
- fuzzy verify: token_sort_ratio >= threshold_products (``groups_creation.py:
  128-140``), package ratio > threshold_package (``static.py:236-260``)
- grouping: greedy merge == transitive closure over verified pairs
  (equivalence argument in SURVEY.md §2.8 A12/V7) → union-find here

Deliberate deviations (documented; both sides of the parity test share them):
- tokenization is whitespace split (nltk is not installed; nltk's
  word_tokenize differs on punctuation-adjacent tokens)
- lemmatization is identity (no WordNet in the sandbox)
- candidate generation is exhaustive O(n^2) (the oracle's job is exactness;
  the reference's TF-IDF top-25 is a recall *bound*, so an exhaustive oracle
  upper-bounds it)
"""

from __future__ import annotations

import re

import pandas as pd

from product_deduplication_spark.functions.normalize import (
    PACKAGE_RE,
    PROMO_RE,
    SPECIAL_CHARS_RE,
    token_sort_ratio,
)
from product_deduplication_spark.oracle.brute_force import union_find_clusters


def remove_duplication_for_uuid(data: pd.DataFrame) -> pd.DataFrame:
    duplicated_df = (
        data.groupby(["item_uuid", "item_name"]).agg({"number_sku_sold": "sum"}).reset_index()
    )
    # the reference's tie order under equal sales is an UNSTABLE pandas
    # quicksort (nondeterministic); both oracle and engine pin ties to
    # lexicographically-first name so the parity test is well-defined
    duplicated_df = duplicated_df.sort_values(
        by=["item_uuid", "number_sku_sold", "item_name"],
        ascending=[False, False, True],
        kind="mergesort",
    ).reset_index(drop=True)
    return duplicated_df.drop_duplicates("item_uuid").reset_index(drop=True)


def nlp_cleaning(df: pd.DataFrame, stop_words: list[str], regex_clean: bool = True) -> pd.DataFrame:
    df = df.copy()
    df["item_name_norm"] = df["item_name"].str.lower().str.strip()
    df = df[~df["item_name_norm"].isna()].reset_index(drop=True)
    df["item_name_norm"] = df["item_name_norm"].apply(
        lambda x: re.sub(SPECIAL_CHARS_RE, "", x)
    )
    # static.py:33 — the whole-string bug, verbatim
    df["item_name_norm_stop"] = df["item_name_norm"].apply(
        lambda x: " ".join([word for word in x.split() if x not in stop_words])
    )
    tokens = df["item_name_norm_stop"].apply(lambda x: x.split())
    df["product_name"] = tokens.apply(lambda lst: " ".join(w for w in lst if w != "."))
    if regex_clean:
        df["product_name"] = df["product_name"].apply(lambda x: re.sub(PROMO_RE, "", x))
    return df


def extract_package(series: pd.Series) -> pd.Series:
    packs = series.str.extract(PACKAGE_RE)
    return packs.apply(lambda x: ",".join(x.dropna()), axis=1)


def verified_pairs(
    names: list[str], threshold_products: int = 95, threshold_package: int = 90
) -> set[tuple[str, str]]:
    """Exhaustive fuzzy verification over distinct normalized names."""
    packages = {n: _pkg(n) for n in set(names)}
    uniq = sorted(set(names))
    out = set()
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            a, b = uniq[i], uniq[j]
            if token_sort_ratio(a, b) >= threshold_products:
                if token_sort_ratio(packages[a], packages[b]) > threshold_package:
                    out.add((a, b))
    return out


def _pkg(name: str) -> str:
    m = re.search(PACKAGE_RE, name)
    if m is None:
        return ""
    return ",".join(g for g in m.groups() if g is not None)


def reference_pipeline(
    raw: pd.DataFrame,
    stop_words: list[str] | None = None,
    threshold_products: int = 95,
    threshold_package: int = 90,
) -> tuple[pd.DataFrame, dict]:
    """Full EP1 oracle → (normalized df, {product_name: cluster_label})."""
    dedup = remove_duplication_for_uuid(raw)
    clean = nlp_cleaning(dedup, stop_words or [])
    names = clean["product_name"].tolist()
    pairs = verified_pairs(names, threshold_products, threshold_package)
    labels = union_find_clusters(sorted(set(names)), sorted(pairs))
    return clean, labels

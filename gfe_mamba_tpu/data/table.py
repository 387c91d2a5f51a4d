"""Tabular clinical-scale preprocessing.

Re-implements reference table/deal_table.py ``prepare_table``
(deal_table.py:28-61): drop identifier/leakage columns, auto-detect
mixed (letter-bearing) object columns as categoricals, label-encode
them (NaN -> 'NA' category), coerce+zero-fill numerics and standardize.

Improvement over the reference (SURVEY.md build step 3): the fitted
encoders/scalers are captured in a serializable ``TablePreprocessor``
so train/eval/serving apply IDENTICAL transforms -- the reference refits
per run, which silently re-maps category codes between train and test.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

DROP_LIST = ["RID", "D2", "SITE", "DX", "COLPROT", "ORIGPROT", "Month",
             "M", "FDG", "PIB", "AV45"]
INFO_LIST = ["PTID", "EXAMDATE", "LABEL"]


def has_letters(value) -> bool:
    return isinstance(value, str) and re.search(r"[a-zA-Z]", value) is not None


def discover_mixed_columns(df: pd.DataFrame) -> list[str]:
    """Object columns containing at least one letter-bearing string
    (deal_table.py:16-25)."""
    mixed = []
    for column in df.select_dtypes(include="object").columns:
        if df[column].apply(has_letters).sum() > 0:
            mixed.append(column)
    return mixed


@dataclass
class TablePreprocessor:
    """Fitted, serializable transform: categorical vocabularies +
    numeric standardization stats."""

    cat_columns: list = field(default_factory=list)
    num_columns: list = field(default_factory=list)
    cat_vocabs: dict = field(default_factory=dict)   # col -> [sorted values]
    num_mean: dict = field(default_factory=dict)
    num_std: dict = field(default_factory=dict)

    @property
    def num_cat(self) -> list[int]:
        return [len(self.cat_vocabs[c]) for c in self.cat_columns]

    @property
    def num_cont(self) -> int:
        return len(self.num_columns)

    def fit(self, df: pd.DataFrame) -> "TablePreprocessor":
        self.cat_columns = discover_mixed_columns(df)
        self.num_columns = [c for c in df.columns if c not in self.cat_columns]
        for col in self.cat_columns:
            values = df[col].fillna("NA").astype(str)
            # LabelEncoder semantics: vocabulary = sorted unique values
            self.cat_vocabs[col] = sorted(values.unique().tolist())
        for col in self.num_columns:
            numeric = pd.to_numeric(df[col], errors="coerce").fillna(0)
            self.num_mean[col] = float(numeric.mean())
            # StandardScaler: population std (ddof=0)
            std = float(numeric.std(ddof=0))
            self.num_std[col] = std if std > 0 else 1.0
        return self

    def transform(self, df: pd.DataFrame):
        cate = np.zeros((len(df), len(self.cat_columns)), np.int64)
        for j, col in enumerate(self.cat_columns):
            vocab = {v: i for i, v in enumerate(self.cat_vocabs[col])}
            values = df[col].fillna("NA").astype(str)
            cate[:, j] = values.map(lambda v: vocab.get(v, 0)).to_numpy()
        conti = np.zeros((len(df), len(self.num_columns)), np.float32)
        for j, col in enumerate(self.num_columns):
            numeric = pd.to_numeric(df[col], errors="coerce").fillna(0)
            conti[:, j] = ((numeric - self.num_mean[col]) /
                           self.num_std[col]).to_numpy(np.float32)
        return cate, conti

    # ---- serialization ----
    def to_json(self) -> str:
        return json.dumps({
            "cat_columns": self.cat_columns,
            "num_columns": self.num_columns,
            "cat_vocabs": self.cat_vocabs,
            "num_mean": self.num_mean,
            "num_std": self.num_std,
        })

    @classmethod
    def from_json(cls, text: str) -> "TablePreprocessor":
        payload = json.loads(text)
        return cls(**payload)


def prepare_table(df: pd.DataFrame,
                  preprocessor: TablePreprocessor | None = None) -> dict:
    """Reference ``prepare_table`` contract (deal_table.py:28-61):
    returns {info, cate_x, conti_x, num_cat, num_cont} (+ the fitted
    ``preprocessor``).  Pass a fitted preprocessor to reuse train-time
    encoders at eval/serving time."""
    drop_list = list(DROP_LIST)
    for col in df.columns:
        if "bl" in col:
            drop_list.append(col)
    info = df[[c for c in INFO_LIST if c in df.columns]]
    body = df.drop(columns=[c for c in drop_list + INFO_LIST
                            if c in df.columns])
    if preprocessor is None:
        preprocessor = TablePreprocessor().fit(body)
    cate_x, conti_x = preprocessor.transform(body)
    return {
        "info": info,
        "cate_x": cate_x,
        "conti_x": conti_x,
        "num_cat": preprocessor.num_cat,
        "num_cont": preprocessor.num_cont,
        "preprocessor": preprocessor,
    }

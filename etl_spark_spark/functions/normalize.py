"""Text-normalization expression library.

These are Column-expression builders, never ``F.udf`` — Catalyst optimizes
straight through them and they stay inside whole-stage codegen (the
reference makes the same choice; SURVEY.md §2.10). Capability parity:

- ``etiqueta``        — barcode canonicalization (reference
  utils_superdesconto.py:58-59): trim → left-pad to fixed width with '0'.
- ``strip_normalize`` — accent-fold + whitespace-collapse + upcase
  (reference utils_ressarcimento.py:7-13).
- ``cnpj_normalize``  — tax-ID canonicalization: strip non-alphanumerics,
  left-pad to 15 (reference utils_ressarcimento.py:16-18).
- ``upper_trim``      — lot-code normalization (utils_superdesconto.py:123).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Accent fold map (equal-length src/dst, lower+upper): Latin-1 accents
# plus the Slavic/German diacritics the reference's 50-char map folds
# (utils_ressarcimento.py:9-10 covers č ď ě ĺ ľ ň ŕ š ť ů ž ẞ …) — this
# map is a strict superset, so every string the reference normalizes
# folds identically here.
_ACCENTS_SRC = (
    "áàâãäåéèêëíìîïóòôõöúùûüçñý"
    "čďěĺľňŕšťůžß"
    "ÁÀÂÃÄÅÉÈÊËÍÌÎÏÓÒÔÕÖÚÙÛÜÇÑÝ"
    "ČĎĚĹĽŇŔŠŤŮŽẞ"
)
_ACCENTS_DST = (
    "aaaaaaeeeeiiiiooooouuuucny"
    "cdellnrstuzs"
    "AAAAAAEEEEIIIIOOOOOUUUUCNY"
    "CDELLNRSTUZS"
)
assert len(_ACCENTS_SRC) == len(_ACCENTS_DST)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def etiqueta(c: Column | str, width: int = 30) -> Column:
    """Zero-padded fixed-width string key (barcode/label canonical form)."""
    return F.lpad(F.trim(_col(c).cast("string")), width, "0")


def strip_normalize(c: Column | str) -> Column:
    """Accent-fold, collapse runs of spaces, trim, uppercase."""
    folded = F.translate(F.trim(_col(c)), _ACCENTS_SRC, _ACCENTS_DST)
    return F.upper(F.regexp_replace(folded, r" +", " "))


def cnpj_normalize(c: Column | str, width: int = 15) -> Column:
    """Strip everything but [0-9a-zA-Z], zero-pad to fixed width."""
    cleaned = F.regexp_replace(F.trim(_col(c).cast("string")), r"[^0-9a-zA-Z]", "")
    return F.lpad(cleaned, width, "0")


def upper_trim(c: Column | str) -> Column:
    return F.upper(F.trim(_col(c)))


def strip_normalize_or_default(c: Column | str, default: str) -> Column:
    """Normalize with a named default for NULLs — the reference's
    dimension-cleanup idiom (``strip_normalize(coalesce(col,
    lit('SEM NOME PROD')))``, utils_ressarcimento.py:192-210)."""
    return strip_normalize(F.coalesce(_col(c), F.lit(default)))

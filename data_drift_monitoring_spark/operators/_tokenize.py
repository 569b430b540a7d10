"""Arrow-side tokenization mirror of the JVM expression convention.

The expression twins (and every DuckDB oracle) tokenize as
``split(regexp_replace(lower([trim](text)), '\\s+', ' '), ' ')`` where

* ``trim()`` strips ONLY space characters (0x20), never tabs/newlines;
* Java/RE2 ``\\s`` is the ASCII class ``[ \\t\\n\\x0b\\f\\r]`` — it does
  NOT match Unicode whitespace such as NBSP.

pandas' defaults diverge on both counts: ``.str.strip()`` strips ALL
whitespace and Python ``\\s`` is Unicode-aware, so a text ending in
``'\\n'`` tokenized with the pandas defaults yields one fewer word than
the expression/oracle convention (``'hello\\n'`` → 1 word vs 2). Every
Arrow tokenizer in this package must therefore go through
:func:`expr_words`, which strips spaces only and collapses exactly the
ASCII class.
"""

from __future__ import annotations

import pandas as pd

# Java \s == RE2 \s == [ \t\n\x0b\f\r]; \x0b is vertical tab.
_ASCII_WS = r"[ \t\n\x0b\f\r]+"


def expr_words(texts: "pd.Series", trim: bool = False) -> "pd.Series":
    """Tokenize like the JVM expression convention.

    ``trim=True`` mirrors ``split(regexp_replace(lower(trim(text)),
    '\\s+', ' '), ' ')`` (repetition/text-analysis convention);
    ``trim=False`` mirrors the same without the outer ``trim``
    (dedup shingle convention). Returns a Series of word lists; empty
    text yields ``['']`` exactly as Spark's ``split('', ' ')`` does.
    """
    s = texts.fillna("").str.lower()
    if trim:
        s = s.str.strip(" ")
    return s.str.replace(_ASCII_WS, " ", regex=True).str.split(" ")

"""The cross-engine corpus tokenizer, defined ONCE (r5 queue item 4).

Casefold → strip non-[a-z0-9 whitespace] → collapse whitespace →
split on single space → drop empties. This is the proven tokenizer
behind ``term_doc_frequency``, ``bm25_retrieval`` and
``hybrid_rrf_retrieval``; before round 6 the Spark expression and the
DuckDB string were duplicated between ``text_plans`` and
``retrieval_plans`` — a silent-drift risk, since the driver's parity
gate would keep passing as long as each copy matched ITS own oracle.
A leaf module (like ``_vector_shared``) keeps the certification dep
closure small: importing this does not drag either plan family into
the other's closure.

Parity notes (pinned by tests/test_text_shared.py):

- Spark's Java-regex ``\\s`` and DuckDB's RE2 ``\\s`` agree on
  space/tab/newline/CR/formfeed, and both treat Unicode spaces like
  NBSP as strippable punctuation (probed: ``'a\\xa0b'`` → ``['ab']``
  in both). The ONE divergent byte is vertical tab ``\\x0b`` (Java
  \\s yes → Spark splits ``'a\\x0bb'`` to ``['a','b']``; RE2 \\s no →
  DuckDB strips it to ``['ab']``). The corpus contract therefore
  excludes \\x0b from document text; the drift test pins every other
  class.
- ``lower()`` is Unicode-aware in both engines; non-ASCII letters are
  then stripped by ``[^a-z0-9\\s]`` identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB expression producing the token list for a column named
#: ``text`` (interpolate into oracle SQL).
D_NORM_WORDS = (
    "list_filter(str_split(regexp_replace(regexp_replace(lower(trim(text)), "
    "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'), ' '), w -> w <> '')"
)


def spark_norm_words(col: Column | str = "text") -> Column:
    """The Spark twin of :data:`D_NORM_WORDS`: ``array<string>`` of
    normalized tokens, empty strings dropped."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(c)), r"[^a-z0-9\s]", ""), r"\s+", " "
    )
    return F.filter(F.split(norm, " "), lambda w: w != "")

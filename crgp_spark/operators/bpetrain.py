"""Distributed BPE merge-rule training (Sennrich et al. 2016) — the
tokenizer-TRAINING step of the LLM pipeline (`textstats.py` only
counts with a fixed BPE-ish regex; this learns the merges).

Word-level BPE: start from characters, repeatedly take the most
frequent adjacent symbol pair (ties broken lexicographically) and
merge it corpus-wide.  The distributed shape per round:

1. pair counting — explode adjacent symbol pairs of the vocab table,
   ONE map-side-combinable ``groupBy(l, r)`` weighted by word
   frequency (the corpus was reduced to ``(word, freq)`` once, up
   front — pair work scales with VOCAB size, not corpus size);
2. winner — global top-1 (``TakeOrderedAndProject``, no full sort);
3. merge — broadcast the 1-row winner and rewrite every word's symbol
   string map-side: zero shuffle.

Symbol sequences are stored as ``(sym)(sym)...`` strings: the
parenthesis framing makes the winner's ``REPLACE`` of ``(l)(r)`` →
``(lr)`` unambiguous (no false submatches across symbol boundaries)
and leftmost-non-overlapping — the classic BPE fold — with identical
semantics in Spark and the SQL oracle (literal ``replace`` replaces
every non-overlapping occurrence scanning left in both engines;
overlap case ``(a)(a)(a)`` merges once, pinned by test).  Symbols stay
in ``[a-z0-9]`` (``normalize_text``), so the framing characters can
never collide.

At 100 TB the per-round cost is one exchange of (distinct-pair)
partial counts — the vocabulary and pair tables are bounded by
distinct words, not tokens; the winner is O(1); the rewrite is
scan-shaped.  That is exactly how production BPE trainers distribute
(frequency tables first, merges over the frequency table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crgp_spark.operators.textstats import normalize_text, tokens


def bpe_train(
    docs: DataFrame, text_col: str = "text", merges: int = 5
) -> DataFrame:
    """Learn ``merges`` BPE merge rules from the corpus; returns
    ``(merge_round, lhs, rhs, cnt)`` — the rule learned each round and
    the (weighted) pair count that won it.  Requires the corpus to
    still have an adjacent pair each round (true for any real corpus
    and ``merges`` ≪ total characters)."""
    if merges < 1:
        raise ValueError(f"need merges >= 1, got {merges}")
    w = (
        docs.select(
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    state = w.select(
        "word",
        F.concat_ws(
            "",
            F.transform(
                # split("sort", "(?!^)") keeps a trailing empty element
                # (the lookahead also matches at end-of-string) — slice
                # to the word's length
                F.slice(
                    F.split(F.col("word"), "(?!^)"), 1, F.length("word")
                ),
                lambda c: F.concat(F.lit("("), c, F.lit(")")),
            ),
        ).alias("s"),
        "freq",
    ).localCheckpoint(eager=True)
    rules = None
    for rnd in range(1, merges + 1):
        syms = F.split(F.expr("substring(s, 2, length(s) - 2)"), r"\)\(")
        pair_arr = F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(syms) - 2),
                lambda i: F.struct(
                    F.element_at(syms, i + 1).alias("lhs"),
                    F.element_at(syms, i + 2).alias("rhs"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<lhs:string,rhs:string>>"))
        pairs = (
            state.select("freq", F.explode(pair_arr).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top1 = (
            pairs.orderBy(F.desc("cnt"), "lhs", "rhs")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        rule = top1.select(
            F.lit(rnd).cast("int").alias("merge_round"), "lhs", "rhs", "cnt"
        )
        rules = rule if rules is None else rules.unionByName(rule)
        state = (
            state.crossJoin(F.broadcast(top1))
            .select(
                "word",
                F.expr(
                    "replace(s, '(' || lhs || ')(' || rhs || ')',"
                    " '(' || lhs || rhs || ')')"
                ).alias("s"),
                "freq",
            )
            .localCheckpoint(eager=True)
        )
    return rules


def _framed(word: F.Column) -> F.Column:
    """Character-framed symbol string of a word: ``cat`` → ``(c)(a)(t)``
    (the training seed shape)."""
    return F.concat_ws(
        "",
        F.transform(
            F.slice(F.split(word, "(?!^)"), 1, F.length(word)),
            lambda c: F.concat(F.lit("("), c, F.lit(")")),
        ),
    )


def bpe_encode(
    docs: DataFrame,
    rules: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with learned merge rules — the APPLY half of the
    tokenizer (`bpe_train` is the learn half).  Returns
    ``(id_col, n_tokens)``: the BPE symbol count of each document
    after replaying the rules in ``merge_round`` order.

    Encoding a word is rule-table-driven, not corpus-driven, so the
    fold runs over the DISTINCT word table (vocabulary-sized) and the
    per-document counts come from one words→vocab join + groupBy.
    The rule table is metadata (``merges`` rows): it folds into a
    single broadcast array and the replay is one JVM-side
    ``F.aggregate`` over it — per-rule semantics identical to
    training's leftmost-non-overlapping framed ``replace``."""
    rule_arr = rules.agg(
        F.sort_array(
            F.collect_list(F.struct("merge_round", "lhs", "rhs"))
        ).alias("_rules")
    )
    words = docs.select(
        F.col(id_col),
        F.explode(tokens(normalize_text(F.col(text_col)))).alias("word"),
    ).filter(F.length("word") > 0)
    vocab = words.select("word").distinct()
    enc = vocab.crossJoin(F.broadcast(rule_arr)).select(
        "word",
        F.aggregate(
            "_rules",
            _framed(F.col("word")),
            lambda acc, r: F.replace(
                acc,
                F.concat(
                    F.lit("("), r["lhs"], F.lit(")("), r["rhs"], F.lit(")")
                ),
                F.concat(F.lit("("), r["lhs"], r["rhs"], F.lit(")")),
            ),
        ).alias("s"),
    )
    n_syms = (
        F.length("s") - F.length(F.replace(F.col("s"), F.lit("(")))
    ).cast("long")
    return (
        words.join(enc, "word")
        .select(id_col, n_syms.alias("_n"))
        .groupBy(id_col)
        .agg(F.sum("_n").alias("n_tokens"))
    )

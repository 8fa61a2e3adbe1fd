"""The driver's correctness gate checks exactly the first 50 entries
of queries() in registration order. These tests pin the curated window
so a future re-registration can't silently drop a component family out
of the canonical artifact again (VERDICT r3, 'What's wrong' #1)."""

import re

import __spark_entry__ as e
from riot_spark.entrypoints import GATE_WINDOW

# family -> regex over query names; every family must keep >=1 row in
# the first-50 window (one load-bearing row per COVERAGE.md family)
FAMILIES = {
    "flat fulltext": r"^ft_(?!block_|batch_)",
    "flat proximity": r"^ft_proximity",
    "flat snippet": r"^ft_snippet",
    "flat delete": r"^ft_delete_requery$",
    "stop tokens": r"^ft_stopworded_df$",
    "text analysis": r"^tx_",
    "dedup": r"^dd_",
    "block layout": r"^ft_block_(?!batch_)",
    "block LSM merge": r"^ft_block_merged$",
    "block store append": r"^ft_block_store_appended$",
    "block delete": r"^ft_block_delete_requery$",
    "flat batch": r"^ft_batch_",
    "block batch": r"^ft_block_batch_",
    "block batch WAND": r"^ft_block_batch_wand$",
    "streaming": r"^stream_",
    "streaming LSM": r"^stream_lsm_",
    "streaming stateful dedup": r"^stream_first_seen$",
    "compat tokenizer": r"^compat_",
    "multimodal": r"^mm_",
    "similarity exact": r"^sim_cosine_topk$",
    "similarity LSH": r"^sim_lsh_",
    "similarity IVF": r"^sim_ivf_",
}


def test_window_is_first_50_of_registration():
    names = list(e.queries().keys())
    assert names[:50] == GATE_WINDOW
    assert len(names) == len(set(names))


def test_every_family_has_a_gated_row():
    window = set(GATE_WINDOW)
    missing = [
        fam for fam, pat in FAMILIES.items()
        if not any(re.search(pat, n) for n in window)
    ]
    assert not missing, f"families with no gated row: {missing}"


def test_overflow_queries_still_have_oracles_or_are_rows_only():
    qs = e.queries()
    oracles = e.oracle_sql()
    overflow = list(qs)[50:]
    # every overflow row must still be locally checkable: either it has
    # a DuckDB oracle or it is an intentional rows-only entry
    assert set(oracles) <= set(qs)
    assert len(overflow) == len(qs) - 50

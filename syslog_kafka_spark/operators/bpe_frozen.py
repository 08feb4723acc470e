"""FROZEN BPE merge table — GENERATED FILE.

Derived by scripts/fit_bpe_merges.py (8 merges, fit on
/root/testdata/sf0.01 with the exact trainer loop llm_bpe_merge_apply
gates). Frozen so llm_bpe_encode_frozen is a pure function both
engines hash-compare. Regenerate with the script; never
hand-edit."""

# rank-ordered (first merge applies first, exactly as trained)
BPE_MERGES: list[tuple[str, str]] = [('e', 'r'), ('i', 'n'), ('o', 'w'), ('o', 'r'), ('s', 't'), ('m', 'er'), ('a', 't'), ('l', 'u')]

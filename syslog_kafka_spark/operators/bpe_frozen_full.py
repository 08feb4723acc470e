"""FROZEN BPE merge table — GENERATED FILE.

Derived by scripts/fit_bpe_merges.py (89 merges (to convergence: pair space exhausted),
fit on /root/testdata/sf0.01 with the exact trainer loop
llm_bpe_merge_apply gates). Frozen so the encode queries are pure
functions both engines hash-compare. Regenerate with the script;
never hand-edit."""

# rank-ordered (first merge applies first, exactly as trained)
BPE_MERGES_FULL: list[tuple[str, str]] = [('e', 'r'), ('i', 'n'), ('o', 'w'), ('o', 'r'), ('s', 't'), ('m', 'er'), ('a', 't'), ('l', 'u'), ('a', 'r'), ('p', 'ar'), ('j', 'o'), ('jo', 'in'), ('a', 's'), ('as', 'h'), ('h', 'ash'), ('r', 'ow'), ('at', 'c'), ('atc', 'h'), ('b', 'atch'), ('a', 'n'), ('c', 'an'), ('s', 'can'), ('c', 'o'), ('c', 'u'), ('co', 'lu'), ('colu', 'm'), ('colum', 'n'), ('cu', 'st'), ('cust', 'o'), ('custo', 'mer'), ('f', 'i'), ('fi', 'l'), ('fil', 't'), ('filt', 'er'), ('a', 'l'), ('al', 'l'), ('m', 'all'), ('s', 'mall'), ('g', 'e'), ('l', 'ow'), ('mer', 'ge'), ('s', 'low'), ('c', 't'), ('ct', 'or'), ('d', 'er'), ('e', 'ctor'), ('or', 'der'), ('v', 'ector'), ('in', 'e'), ('l', 'ine'), ('a', 'b'), ('ab', 'l'), ('abl', 'e'), ('at', 'a'), ('d', 'ata'), ('t', 'able'), ('u', 'p'), ('a', 'g'), ('ag', 'g'), ('a', 'lu'), ('alu', 'e'), ('v', 'alue'), ('e', 'y'), ('k', 'ey'), ('a', 'm'), ('e', 'am'), ('r', 'eam'), ('st', 'ream'), ('d', 'ow'), ('in', 'dow'), ('w', 'indow'), ('par', 'k'), ('s', 'park'), ('g', 'r'), ('gr', 'o'), ('gro', 'up'), ('par', 't'), ('b', 'i'), ('bi', 'g'), ('or', 't'), ('s', 'ort'), ('er', 'y'), ('q', 'u'), ('qu', 'ery'), ('a', 'st'), ('f', 'ast'), ('h', 'e'), ('t', 'he'), ('d', 'up')]

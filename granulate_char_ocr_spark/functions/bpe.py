"""Real BPE token counting (VERDICT r3 item 5): a trained merges table
applied per pre-token, not just the pre-tokenizer regex proxy.

The GPT-2 tokenizer shape (Sennrich et al. 2016 "Neural Machine
Translation of Rare Words with Subword Units"; Radford et al. 2019):
split text with a pre-tokenizer regex, then greedily apply the learned
merge with the LOWEST rank until no learned pair remains; the token
budget is the number of resulting subword symbols. The merges table
(resources/bpe_merges.txt, one 'a b' pair per line in rank order) is
trained by tools/train_bpe.py over the sf0.01 documents corpus and
committed — a pure function of (corpus, N_MERGES), regenerable.

Spark integration (operators/textstats.bpe_merged_count): an
Arrow-batched pandas UDF; the ranks dict is an executor-level singleton
loaded from the packaged resource (the same pattern as the classifier
prototype state — the package ships to executors with the job), and a
per-executor word cache makes the amortized cost one dict lookup per
pre-token (natural-language corpora repeat words; the cache hit rate IS
the Zipf curve). The pre-tokenizer here is the Python-re rendering of
the GPT-2 pattern; the golden oracle runs THIS module's functions, so
the contract is twin-equality, not cross-regex-engine parity (unlike
textstats.BPE_PATTERN, which is mirrored in Java/RE2 for the pure-SQL
count columns).

Space handling uses the GPT-2 byte-encoder convention: a leading space
is folded into the word as 'Ġ' so merge symbols never contain a literal
space (keeps the merges file line format unambiguous).
"""

from __future__ import annotations

import os
import re
from collections import Counter

# letters / digits / other-runs, each optionally glued to one leading
# space, else whitespace runs — the GPT-2 shape in stdlib-re classes
# ('_' rides with the other-run class; \w would put it with letters)
_PRETOKEN_RE = re.compile(r" ?[^\W\d_]+| ?\d+| ?(?:[^\w\s]|_)+|\s+")

_SPACE = "Ġ"  # 'Ġ', the GPT-2 leading-space marker

MERGES_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "bpe_merges.txt",
)

N_MERGES = 500


def pretokenize(text: str) -> list[str]:
    return _PRETOKEN_RE.findall(text)


def _to_symbols(tok: str) -> list[str]:
    if tok.startswith(" "):
        tok = _SPACE + tok[1:]
    return list(tok)


def train_bpe(texts: list[str], n_merges: int = N_MERGES) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from word frequencies. Deterministic:
    ties on pair count break lexicographically."""
    words = Counter()
    for t in texts:
        for tok in pretokenize(t):
            if not tok.isspace():
                words[tuple(_to_symbols(tok))] += 1
    return train_bpe_from_counts(words, n_merges)


def train_bpe_from_counts(
    word_counts: Counter, n_merges: int = N_MERGES
) -> list[tuple[str, str]]:
    """The merge loop over a WEIGHTED vocabulary: keys are symbol tuples
    (already space-folded via :func:`_to_symbols`), values are corpus
    frequencies. This is the half of BPE training that is NOT
    corpus-size-proportional — the vocabulary is Zipf-bounded — so it
    runs driver-side over the output of one distributed word count
    (operators/textstats.train_bpe_spark), the same split production
    tokenizer trainers use (HF tokenizers: count words distributed,
    merge-loop the counts)."""
    words = Counter(word_counts)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, c in words.items():
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, then the lexicographically smallest pair among those
        top = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == top)
        merges.append(best)
        a, b = best
        ab = a + b
        new_words = Counter()
        for w, c in words.items():
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == a and w[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words
    return merges


def save_merges(merges: list[tuple[str, str]], path: str = MERGES_PATH) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(f"{a} {b}" for a, b in merges) + "\n")


def load_ranks(path: str = MERGES_PATH) -> dict[tuple[str, str], int]:
    ranks: dict[tuple[str, str], int] = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            line = line.rstrip("\n")
            if not line:
                continue
            a, b = line.split(" ")
            ranks[(a, b)] = i
    return ranks


# The merge loop below is O(len^2) per token. Normal words are tiny, but
# a no-whitespace run (base64 blob, DNA string, minified JS) pre-tokenizes
# as ONE token — a 64k-char run measured 77 s, a 10 MB blob would take
# days on one executor core. Tokens longer than this are merged in
# independent chunks: only pairs straddling a boundary are lost, so the
# count drifts by at most 1 symbol per 512 chars — noise for a counting
# proxy, and deterministic (the golden oracle runs this same function).
_MAX_MERGE_SPAN = 512

# don't memoize pathological keys: a cache of 10 MB strings is its own
# executor-memory leak; real vocabulary words are far below this
_MAX_CACHE_KEY = 256


def bpe_symbols(
    tok: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Apply merges to one non-whitespace pre-token: repeatedly merge the
    present pair with the lowest rank (the standard GPT-2 encode loop)."""
    symbols = _to_symbols(tok)
    if len(symbols) > _MAX_MERGE_SPAN:
        out: list[str] = []
        for i in range(0, len(symbols), _MAX_MERGE_SPAN):
            out.extend(_merge(symbols[i : i + _MAX_MERGE_SPAN], ranks))
        return out
    return _merge(symbols, ranks)


def _merge(parts: list[str], ranks: dict[tuple[str, str], int]) -> list[str]:
    while len(parts) > 1:
        best_rank, best_i = None, -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def count_tokens(
    text: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, int] | None = None,
) -> int:
    """Merged-BPE token count of a document: whitespace runs count one
    each (mirroring the regex proxy's accounting), words count their
    post-merge symbol count."""
    n = 0
    for tok in pretokenize(text):
        if tok.isspace():
            n += 1
            continue
        if cache is not None and tok in cache:
            n += cache[tok]
            continue
        k = len(bpe_symbols(tok, ranks))
        if cache is not None and len(tok) <= _MAX_CACHE_KEY:
            cache[tok] = k
        n += k
    return n


_EXECUTOR_STATE: dict[str, object] = {}


def executor_ranks_and_cache():
    """Per-process singleton (the S5 model/checkpoint-source pattern):
    ranks parsed once per executor, word cache shared across batches."""
    if "ranks" not in _EXECUTOR_STATE:
        _EXECUTOR_STATE["ranks"] = load_ranks()
        _EXECUTOR_STATE["cache"] = {}
    return _EXECUTOR_STATE["ranks"], _EXECUTOR_STATE["cache"]

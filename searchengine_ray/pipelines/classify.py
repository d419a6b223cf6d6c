"""Personal-blog classifier cascade — reference parity (SURVEY.md §2.3
F7/F8; /root/reference/search_engine/classifier/classifier.py:41-196).

Hierarchical rule cascade, re-expressed as one stateless Arrow
``map_batches`` stage (the reference loops file-by-file):

  step 1  domain allow/deny regex lists over the "domain" field
          (classifier.py:82-100; our corpus analogue: the ``source``/
          ``repo`` column) → confidence 0.9, method 'domain_pattern'
  step 2  header/footer — requires raw HTML (classifier.py:102-124);
          Parquet corpora carry none, so this tier is vacuous and the
          cascade falls through (exactly what the reference does when
          ``_extract_header_footer`` returns "")
  step 3  content-pattern scoring over "{title} {meta} {content[:2000]}"
          (classifier.py:126-142, 144-196): matches = #patterns found,
          confidence = min(0.5 + 0.1·matches, 0.9), personal iff ≥ 0.6;
          the <0.6 fallback coerces to (0.65, True), method 'content'

Output is integer/bool-exact (confidence emitted ×100 as int64 — the
confidence lattice {0.5..0.9, 0.65} rounds identically in numpy and
DuckDB) so the SQL oracle hash-matches bit-for-bit.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# classifier.py:42-53 — domain patterns (RE2-safe, shared with the oracle)
PERSONAL_DOMAIN_PATTERNS = [
    r"\.substack\.com$", r"\.medium\.com$", r"\.wordpress\.com$",
    r"\.blogspot\.com$", r"\.tumblr\.com$", r"\.ghost\.io$",
    r"\.github\.io$", r"\.netlify\.app$", r"\.vercel\.app$",
    r"blog\.", r"\.blog$",
]
# classifier.py:56-68
NON_PERSONAL_DOMAIN_PATTERNS = [
    r"\.gov$", r"\.edu$", r"news\.", r"\.com/news", r"wikipedia\.org$",
    r"amazon\.com$", r"facebook\.com$", r"twitter\.com$",
    r"instagram\.com$", r"linkedin\.com$", r"youtube\.com$",
]
# classifier.py:71-80 (searched on lowercased text)
PERSONAL_CONTENT_PATTERNS = [
    r"my (thoughts|journey|experience|story)", r"i (believe|think|feel)",
    r"about me", r"my blog", r"written by", r"author", r"personal",
    r"opinion",
]

CONTENT_SAMPLE_CHARS = 2000  # classifier.py:181


def classify(ds: "ray.data.Dataset", domain_col: str = "source",
             title_expr=None, meta_col: str = "lang",
             text_col: str = "text",
             id_col: str = "doc_id") -> "ray.data.Dataset":
    """Classify each doc. Columns: doc_id, is_personal (int64 0/1),
    confidence_c (int64, ×100), method (string).

    Field mapping for the documents table: domain := source,
    title := 'doc_{id}.txt', meta := source+' '+lang, content := text —
    the same mapping the BM25 engine uses (FIXTURES.md §2).
    """
    def fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        domain = pc.utf8_lower(pc.cast(batch[domain_col], pa.string()))
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        # step 1: vectorized domain regex tiers (first match wins per tier,
        # personal tier checked first — classifier.py:88-96)
        personal_dom = np.zeros(n, dtype=bool)
        for pat in PERSONAL_DOMAIN_PATTERNS:
            personal_dom |= pc.match_substring_regex(domain, pat).to_numpy(
                zero_copy_only=False)
        non_personal_dom = np.zeros(n, dtype=bool)
        for pat in NON_PERSONAL_DOMAIN_PATTERNS:
            non_personal_dom |= pc.match_substring_regex(domain, pat).to_numpy(
                zero_copy_only=False)
        non_personal_dom &= ~personal_dom

        # step 3: content-pattern counting over the combined lowercased text
        title = pa.array([f"doc_{int(d)}.txt" for d in ids], type=pa.string())
        meta = pc.binary_join_element_wise(
            pc.cast(batch[domain_col], pa.string()),
            pc.cast(batch[meta_col], pa.string()), " ")
        sample = pc.utf8_slice_codeunits(
            pc.cast(batch[text_col], pa.string()), 0, CONTENT_SAMPLE_CHARS)
        combined = pc.utf8_lower(pc.binary_join_element_wise(
            title, meta, sample, " "))
        matches = np.zeros(n, dtype=np.int64)
        for pat in PERSONAL_CONTENT_PATTERNS:
            matches += pc.match_substring_regex(combined, pat).to_numpy(
                zero_copy_only=False)
        conf = np.minimum(0.5 + matches * 0.1, 0.9)
        personal_content = conf >= 0.6
        low = conf < 0.6
        conf = np.where(low, 0.65, conf)
        personal_content = np.where(low, True, personal_content)

        dom_hit = personal_dom | non_personal_dom
        is_personal = np.where(dom_hit, personal_dom, personal_content)
        confidence = np.where(dom_hit, 0.9, conf)
        method = np.where(dom_hit, "domain_pattern", "content")
        return pa.table({
            "doc_id": pa.array(ids),
            "is_personal": pa.array(is_personal.astype(np.int64)),
            "confidence_c": pa.array(np.round(confidence * 100).astype(np.int64)),
            "method": pa.array(method.tolist(), type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def sql_classify() -> str:
    """DuckDB restatement of the cascade (same regexes, same arithmetic)."""
    p_dom = " OR ".join(
        f"regexp_matches(lower(source), '{p}')" for p in PERSONAL_DOMAIN_PATTERNS)
    np_dom = " OR ".join(
        f"regexp_matches(lower(source), '{p}')"
        for p in NON_PERSONAL_DOMAIN_PATTERNS)
    m_sum = " + ".join(
        f"(CASE WHEN regexp_matches(combined, '{p}') THEN 1 ELSE 0 END)"
        for p in PERSONAL_CONTENT_PATTERNS)
    return f"""
WITH base AS (
  SELECT doc_id,
         ({p_dom}) AS pdom,
         (NOT ({p_dom})) AND ({np_dom}) AS ndom,
         lower('doc_' || doc_id || '.txt' || ' ' || source || ' ' || lang
               || ' ' || substr(text, 1, {CONTENT_SAMPLE_CHARS})) AS combined
  FROM documents),
scored AS (
  SELECT doc_id, pdom, ndom, {m_sum} AS m FROM base),
content AS (
  SELECT doc_id, pdom, ndom,
         least(0.5 + m * 0.1, 0.9) AS conf0 FROM scored),
final AS (
  SELECT doc_id, pdom, ndom,
         CASE WHEN conf0 < 0.6 THEN 0.65 ELSE conf0 END AS conf,
         CASE WHEN conf0 < 0.6 THEN true ELSE conf0 >= 0.6 END AS pers
  FROM content)
SELECT doc_id,
       CASE WHEN pdom OR ndom THEN (CASE WHEN pdom THEN 1 ELSE 0 END)
            ELSE (CASE WHEN pers THEN 1 ELSE 0 END) END::BIGINT AS is_personal,
       round(CASE WHEN pdom OR ndom THEN 0.9 ELSE conf END * 100)::BIGINT
         AS confidence_c,
       CASE WHEN pdom OR ndom THEN 'domain_pattern' ELSE 'content' END
         AS method
FROM final
"""

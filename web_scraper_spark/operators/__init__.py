"""Generic operators: relational patterns the reference implements
(as-of join, grouped top-k, first-seen dedup, sessionization, collision
numbering) plus the large-scale training-data-pipeline family (dedup,
similarity search, text analysis, multimodal plumbing).

Design rule: one shuffle per logical operation, keyed on the operation's
natural key; broadcast small sides; everything JVM-side unless the
semantics require Python (then Arrow-batched).
"""

"""Large-scale training-data operators (first-class components beyond the
reference's own surface, per the build brief): dedup family, similarity
search, text analysis, multimodal plumbing, and the relational/window
operators that prove the general engine (groupby / join / sort / as-of).
"""

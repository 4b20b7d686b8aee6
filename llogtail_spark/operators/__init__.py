"""Pipeline operators: parse, enrich, route, aggregate, plus the
training-data operators (dedup, similarity, text analysis,
multimodal). Each is a pure DataFrame -> DataFrame function."""

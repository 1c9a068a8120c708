"""Behavioral-quality benchmarks (reference: benchmarks/ — session
replay, A/B harnesses, miss diagnosis). Methodology ports over synthetic
fixtures; the reference's real inputs (agent transcripts) are private."""

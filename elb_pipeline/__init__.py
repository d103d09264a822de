"""PySpark-native parse → enrich → route → aggregate pipeline.

A brand-new Spark-first engine with the query/data-processing semantics of
the reference Rust CLI (simnalamburt/elb-log-parser, read-only at
/root/reference): Classic-LB / ALB access-log grammars, parse-or-reject
routing, NDJSON field-exact output — generalized to run over a distributed
transcripts table (conv_id, turn_idx, role, text, tool, ts) at cluster
scale with broadcast enrichment, salted aggregation, and checkpoint-resume.
"""

from elb_pipeline.dialects import (  # noqa: F401
    ALB,
    ALB_FIELDS,
    ALB_PATTERN,
    CLASSIC,
    CLASSIC_FIELDS,
    CLASSIC_PATTERN,
    DIALECTS,
    SINK_ALB,
    SINK_CLASSIC,
    SINK_MALFORMED,
    SINKS,
    parse_line,
)

"""Pipeline: label discovery -> ROI bucketing -> batched kernel dispatch -> table."""

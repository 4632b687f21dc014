"""Pure-Python oracle reimplementing the reference semantics exactly.

No Spark imports here. The oracle is the ground truth for:
- per-record parse/validate classification (go_parse_record — emulates
  Go encoding/json + model.go:16-29),
- page-level extraction + routing (classify_page — the canonical contract
  shared with the Spark parse stage via functions/extract.py),
- aggregation folds and the fixed-width summary format
  (summaries.py — internal/accesslog/summaries.go, print.go).
"""

from .parser import GoParseError, classify_page, go_parse_record  # noqa: F401
from .summaries import Summaries, fold_records, format_summaries  # noqa: F401

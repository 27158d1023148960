"""Job orchestration surface (S15)."""

from .runner import JobResult, report_df, run_jobs

__all__ = ["JobResult", "report_df", "run_jobs"]

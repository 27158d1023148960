"""Plan-level surfaces: registered Spark SQL views of the report
family (``views``) — the SQL-speaking client's entry point, planned by
the same Catalyst rules as the DataFrame API."""

from .views import REPORT_VIEWS, register_report_views

__all__ = ["REPORT_VIEWS", "register_report_views"]

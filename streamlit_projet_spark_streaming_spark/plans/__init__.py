"""Logical plans: the reference's four analytical views and the dashboard
aggregate queries, expressed as composable DataFrame builders."""

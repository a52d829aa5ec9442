"""Serving layer: the dashboard's client-side pandas dataflow re-expressed
as Spark queries over the silver/gold tables."""

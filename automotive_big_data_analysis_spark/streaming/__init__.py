"""Structured Streaming surface: the batch event-time operators of
``operators/events.py`` exposed over ``readStream`` with watermarks."""

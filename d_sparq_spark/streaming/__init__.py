"""Structured-streaming variants of the event-table operators. The batch
forms (queries/events_windows.py) are the oracle-checked semantics; these
wrappers run the same logic through readStream (SURVEY.md §2.C streaming
rows)."""

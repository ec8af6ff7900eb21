"""Crawl frontier: seen-set, politeness, scheduler, snapshot store,
and the sequential reference-semantics oracle."""

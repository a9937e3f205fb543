"""Input sources: synthetic Common-Crawl-style pages + snapshot catalog."""

"""Query plans: the driver-facing query registry and the crawl plans."""

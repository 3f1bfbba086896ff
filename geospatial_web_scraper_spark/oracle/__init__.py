from .crawl_oracle import CrawlResult, crawl_oracle  # noqa: F401

"""Sources and sinks: REST poller, raw/curated file zones."""

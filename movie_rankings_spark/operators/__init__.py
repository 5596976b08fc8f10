"""Operators — relational + LLM-pipeline tiers, each a pure function
DataFrame → DataFrame so compositions stay one lazy Catalyst plan."""

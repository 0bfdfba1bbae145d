"""Native (C++) fast graph builder package."""

from .database import ExchangeDatabase

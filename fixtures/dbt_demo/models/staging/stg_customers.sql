SELECT c_custkey, c_name FROM {{ source('raw', 'customers') }}
